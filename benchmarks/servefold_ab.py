"""Serve-side trunk reflect-fold A/B in the REAL b128 serving graph.

The trunk fold ships TRAIN-gated: forward-only the 4-strip+4-DUS assembly
measured a small net loss at b32 (padfold_ab / RESULTS.md round 4), and
the isolated microbench ranked batched-strips+where slightly better than
reflect (foldstrip_ab: 4.75 vs 4.90 ms/conv).  This A/B settles whether
either assembly wins the FULL bench-shaped serving graph (b128@512²,
g_apply incl. pad-10), where the trunk is 74% of the step
(profile_breakdown round 5):

  reflect      production (explicit reflect pads, fold train-gated)
  fold-DUS     NIRGAN_FOLD_SERVE=1 with the shipped 4-strip+DUS assembly
  fold-where   NIRGAN_FOLD_SERVE=1 with batched-strips+where assembly

Run on the TPU: timeout 1800 python benchmarks/servefold_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    import nirgan_tpu.models.generator as gen_mod
    from nirgan_tpu.config import load_config
    from nirgan_tpu.ops.conv import conv2d
    from nirgan_tpu.tasks import Px2PxTask

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "config_px2px.yaml"))
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=512)
    params = state.params_g

    real_c2r = gen_mod.conv2d_reflect

    def where_fold(x, k, bias=None, pad: int = 1):
        """batched-strips + single where-select assembly (foldstrip v4)."""
        p = pad
        kh = k.shape[0]
        b, h, w, _ = x.shape
        assert h == w, "where-assembly uses one size for both axes (A/B-only)"
        if p == 0 or kh != 2 * p + 1 or h < 4 * p + 1 or w < 4 * p + 1:
            return real_c2r(x, k, bias, pad=pad)
        y = conv2d(x, k, bias, padding=p)
        wp = lambda t: jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)),
                               mode="reflect")
        hp = lambda t: jnp.pad(t, ((0, 0), (p, p), (0, 0), (0, 0)),
                               mode="reflect")
        ti = wp(jnp.concatenate([jnp.flip(x[:, 1:p + 1], 1), x[:, :2 * p]], 1))
        bi = wp(jnp.concatenate([x[:, -2 * p:], jnp.flip(x[:, -p - 1:-1], 1)], 1))
        li = hp(jnp.concatenate([jnp.flip(x[:, :, 1:p + 1], 2), x[:, :, :2 * p]], 2))
        ri = hp(jnp.concatenate([x[:, :, -2 * p:], jnp.flip(x[:, :, -p - 1:-1], 2)], 2))
        s_h = conv2d(jnp.concatenate([ti, bi], 0), k, bias)
        t_, b_ = jnp.split(s_h, 2, axis=0)
        lit = jnp.transpose(li, (0, 2, 1, 3))
        rit = jnp.transpose(ri, (0, 2, 1, 3))
        kt = jnp.transpose(k, (1, 0, 2, 3))
        s_w = conv2d(jnp.concatenate([lit, rit], 0), kt, bias)
        l_, r_ = jnp.split(s_w, 2, axis=0)
        l_ = jnp.transpose(l_, (0, 2, 1, 3))
        r_ = jnp.transpose(r_, (0, 2, 1, 3))
        hh = y.shape[1]
        border = (jnp.pad(t_, ((0, 0), (0, hh - p), (0, 0), (0, 0)))
                  + jnp.pad(b_, ((0, 0), (hh - p, 0), (0, 0), (0, 0)))
                  + jnp.pad(l_[:, p:-p], ((0, 0), (p, p), (0, hh - p), (0, 0)))
                  + jnp.pad(r_[:, p:-p], ((0, 0), (p, p), (hh - p, 0), (0, 0))))
        ih = jnp.arange(hh)
        mask = ((ih < p) | (ih >= hh - p))[None, :, None, None]
        mask = mask | mask.transpose(0, 2, 1, 3)
        return jnp.where(mask, border, y)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((128, 512, 512, 3), np.float32))

    def run(label):
        @jax.jit
        def serve(p, x, acc):
            y = task.g_apply(p, x.astype(task.compute_dtype), train=False)
            return acc + jnp.sum(y.astype(jnp.float32))

        acc = serve(params, xs, jnp.zeros((), jnp.float32))
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = serve(params, xs, acc)
        assert np.isfinite(float(acc))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:12s} serve b128 {ms:7.1f} ms ({128 / ms * 1e3:6.1f} t/s)",
              flush=True)

    print("== serve-side trunk fold A/B, b128@512²+pad-10 bf16 ==", flush=True)
    run("reflect")
    os.environ["NIRGAN_FOLD_SERVE"] = "1"
    try:
        run("fold-DUS")
        gen_mod.conv2d_reflect = where_fold
        run("fold-where")
    finally:
        gen_mod.conv2d_reflect = real_c2r
        os.environ.pop("NIRGAN_FOLD_SERVE", None)


if __name__ == "__main__":
    main()
