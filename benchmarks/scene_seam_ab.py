"""A/B: does plateau-cosine blending actually remove tile seams?

The generator is not shift-invariant across tile boundaries — instance-norm
statistics are per-window and reflect-pad edge handling differs — so naive
abutted tiles (overlap=0) show seams.  This script quantifies them: mean
absolute horizontal/vertical jump ACROSS the known seam lines vs the mean
interior gradient, for naive vs blended synthesis of the same scene with the
same weights.

Runs anywhere (CPU by default): the effect is architectural, not numeric.

    python benchmarks/scene_seam_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the sitecustomize on PYTHONPATH forces JAX_PLATFORMS=axon — override it;
# this A/B is architectural, not numeric, and must not depend on the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nirgan_tpu.config import load_config
    from nirgan_tpu.inference.scene import synthesize_scene
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    cfg.base_configs.ngf = 16
    cfg.tpu.compute_dtype = "float32"
    cfg.Data.fake_settings.image_size = 64
    cfg.Data.fake_settings.length = 64
    cfg.Data.train_batch_size = 8
    cfg.Data.num_workers = 0
    cfg.tpu.train_metrics_every = 1  # so the L1 print below is not NaN
    task = Px2PxTask(cfg)

    # a random-init generator emits near-noise (interior gradient ~0.37 on
    # the [-1,1] range) which buries any seam — train briefly so the output
    # is smooth and seams are the dominant artifact, as in production
    import pickle

    from nirgan_tpu.data import dataset_selector

    cache = "/tmp/seam_ab_params.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            task.bind(pickle.load(f))
        print("loaded cached trained params", flush=True)
    else:
        state = task.init_state(seed=0, image_size=64)
        step = task.make_train_step()
        dm = dataset_selector(cfg)
        it = None
        for s in range(300):
            if it is None:
                it = iter(dm.train_dataloader())
            try:
                batch = next(it)
            except StopIteration:
                it = None
                continue
            state, metrics = step(state, task.extract_batch(batch))
        print("trained 300 steps, train/L1 =",
              float(jax.device_get(metrics["model_loss/generator_L1"])),
              flush=True)
        with open(cache, "wb") as f:
            pickle.dump(jax.device_get(state.params_g), f)
        task.bind(state)

    rng = np.random.default_rng(0)
    # smooth synthetic scene (correlated, like real imagery) so the
    # interior-gradient baseline is small and seams stand out honestly
    base = rng.random((3, 32, 32)).astype(np.float32)
    from nirgan_tpu.ops.resize import resize_bilinear
    import jax.numpy as jnp

    scene = np.asarray(resize_bilinear(
        jnp.asarray(base.transpose(1, 2, 0))[None], 256, 256))[0]
    scene = np.clip(scene.transpose(2, 0, 1), 0, 1)
    # add a diagonal luminance ramp so per-window statistics genuinely differ
    # — that's what makes independent windows disagree (instance norm), i.e.
    # the actual seam mechanism in production scenes (coast→inland, cloud
    # shadow); without it every 128² window has near-identical stats and
    # naive tiling is accidentally seam-free
    yy, xx = np.meshgrid(np.linspace(0, 1, 256), np.linspace(0, 1, 256),
                         indexing="ij")
    scene = np.clip(0.35 * scene + 0.65 * ((yy + xx) / 2)[None], 0, 1)

    TILE = 128

    # Seam-free reference: the whole 256² scene through ONE window.  Gradients
    # at any column of this image are pure content; a tiled synthesis is
    # seam-free iff its gradient at the window-edge positions matches this
    # reference's gradient at the SAME positions.  (An interior-vs-seam ratio
    # within one image is confounded here: the test scene is an 8× bilinear
    # upsample, so |∇| is phase-structured mod 8 and every window edge sits at
    # the same phase.)
    mono = synthesize_scene(task, scene, tile=256, overlap=0, batch_size=1)[0]

    def seam_ratio(img, edges):
        """mean |jump| across the given column/row positions, normalised by
        the seam-free reference's jump at identical positions."""
        cols = [e - 1 for e in edges if 0 < e < img.shape[1]]
        gi = np.concatenate([np.abs(np.diff(img, axis=1))[:, cols].ravel(),
                             np.abs(np.diff(img, axis=0))[cols, :].ravel()])
        gr = np.concatenate([np.abs(np.diff(mono, axis=1))[:, cols].ravel(),
                             np.abs(np.diff(mono, axis=0))[cols, :].ravel()])
        return float(gi.mean() / gr.mean())

    naive = synthesize_scene(task, scene, tile=TILE, overlap=0, batch_size=4)[0]
    n_ratio = seam_ratio(naive, list(range(TILE, 256, TILE)))
    print(f"naive (overlap=0):  seam jump = {n_ratio:6.2f}x content", flush=True)
    for ov in (8, 16, 32):
        blended = synthesize_scene(task, scene, tile=TILE, overlap=ov,
                                   batch_size=4)[0]
        # a window placed at padded-origin k·S spans original coords
        # [k·S−ov, k·S−ov+TILE); discontinuities can only appear where a
        # window ENTERS or EXITS the accumulation — those edges, not the
        # stride multiples
        stride = TILE - 2 * ov
        k_max = 256 // stride + 2
        edges = sorted({k * stride - ov for k in range(1, k_max)} |
                       {k * stride - ov + TILE for k in range(0, k_max)})
        edges = [e for e in edges if 0 < e < 256]
        b_ratio = seam_ratio(blended, edges)
        print(f"overlap={ov:2d}:  blended seam jump = {b_ratio:6.2f}x content "
              f"({len(edges)} edge lines)", flush=True)


if __name__ == "__main__":
    main()
