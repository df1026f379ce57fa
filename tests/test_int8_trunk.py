"""int8 serving trunk (ops/int8_trunk.py): math exactness, quality guard,
and task/pipeline wiring.

The mode quantises the residual trunk for inference (opt-in
``tpu.serving_quant: int8``); these tests pin down (a) the
IN-in-accumulator-units identity the formulation rests on, (b) the output
PSNR bound vs the float path, and (c) that the knob flows through
``predict_step`` and ``synthesize_dataset``.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.ops.int8_trunk import (
    _conv_moments,
    _norm_from_moments,
    _pad2d,
    _quant_folded,
    calibrate_trunk,
    quantize_trunk,
)
from nirgan_tpu.ops.norm import instance_norm


def _psnr(a, b, rng=2.0):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(rng * rng / mse)


def test_in_from_accumulator_units_is_exact():
    """IN(conv(x, w) + bias) computed from the int8 accumulator (eps
    adjusted per channel) must equal the real-unit affine-free IN whenever
    weights and inputs are exactly int8-representable — the invariance the
    whole formulation rests on, incl. the bias no-op."""
    rng = np.random.default_rng(0)
    C = 8
    # exactly representable activations: integers in [-100, 100] × per-ch scale
    s_in = np.linspace(0.01, 0.05, C).astype(np.float32)
    xi = rng.integers(-100, 101, (2, 12, 12, C)).astype(np.float32)
    x = xi * s_in  # real
    # weights: int grid × 0.001, with ±max pinned so the folded per-out-channel
    # scale reproduces the grid exactly after folding by s_in⁻¹-free path
    w = (rng.integers(-50, 51, (3, 3, C, C)).astype(np.float32)) * 1e-3
    bias = rng.normal(size=(C,)).astype(np.float32)

    # real path: reflect-pad → conv (+bias) → affine-free IN
    xp = _pad2d(jnp.asarray(x), "reflect")
    real = jax.lax.conv_general_dilated(
        xp, jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    real_in = instance_norm(real)

    # quantised path (bias dropped on purpose)
    w8, eps_adj = _quant_folded(w, jnp.asarray(s_in))
    x8 = jnp.asarray(np.rint(x / s_in)).astype(jnp.int8)
    hb, m1, m2 = _conv_moments(_pad2d(x8, "reflect"), w8)
    got = _norm_from_moments(hb, m1, m2, eps_adj, 12 * 12)

    # bf16 staging of the accumulator bounds agreement at ~bf16 precision
    assert _psnr(got, real_in, rng=float(np.abs(np.asarray(real_in)).max())) > 45


@pytest.fixture(scope="module")
def small_gen():
    g = ResnetGenerator(input_nc=3, output_nc=1, ngf=32, n_blocks=9,
                        compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 84, 84, 3), jnp.float32) * 0.3
    params = g.init(jax.random.PRNGKey(0), x)["params"]
    return g, params, x


def test_int8_trunk_output_psnr_guard(small_gen):
    """End-to-end generator output with the int8 trunk stays within a
    measured PSNR bound of the float path — on a batch the calibration
    never saw (margin 1.2 sweep, RESULTS.md)."""
    g, params, x = small_gen
    x_unseen = jax.random.uniform(jax.random.PRNGKey(7), (2, 84, 84, 3),
                                  jnp.float32) * 0.3
    calib = calibrate_trunk(g, params, x)
    qp = quantize_trunk(params, 9, calib)
    for xx in (x, x_unseen):
        ref = g.apply({"params": params}, xx, train=False)
        got = g.apply({"params": params}, xx, train=False, trunk_q=qp)
        assert _psnr(got, ref) > 36.0


def test_int8_stage2_d1(small_gen):
    """Stage-2 (the d1 downsample conv, ``int8_d1_forward`` — opt-in,
    default OFF by measurement): a ``stage2=True`` calibration carries the
    quantised d1 and the PSNR guard holds; the default pack is trunk-only
    and the two forwards differ (i.e. the d1 int8 path actually runs)."""
    g, params, x = small_gen
    calib = calibrate_trunk(g, params, x, stage2=True)
    assert "d1_in" in calib and calib["d1_in"].shape == (64,)  # ngf*2
    qp2 = quantize_trunk(params, 9, calib)
    assert "d1" in qp2 and qp2["d1"]["w"].dtype == jnp.int8
    assert qp2["d1"]["w"].shape == (3, 3, 64, 128)

    calib1 = calibrate_trunk(g, params, x)  # default: trunk-only
    qp1 = quantize_trunk(params, 9, calib1)
    assert "d1" not in qp1

    x_unseen = jax.random.uniform(jax.random.PRNGKey(7), (2, 84, 84, 3),
                                  jnp.float32) * 0.3
    for xx in (x, x_unseen):
        ref = g.apply({"params": params}, xx, train=False)
        got2 = g.apply({"params": params}, xx, train=False, trunk_q=qp2)
        got1 = g.apply({"params": params}, xx, train=False, trunk_q=qp1)
        assert _psnr(got2, ref) > 36.0
        assert not np.array_equal(np.asarray(got2), np.asarray(got1))


def test_int8_trunk_rejects_train_and_nonstance_norm(small_gen):
    g, params, x = small_gen
    calib = calibrate_trunk(g, params, x)
    qp = quantize_trunk(params, 9, calib)
    with pytest.raises(ValueError, match="serving-only"):
        g.apply({"params": params}, x, train=True, trunk_q=qp,
                rngs={"dropout": jax.random.PRNGKey(0)})


def test_calibration_scales_are_sane(small_gen):
    g, params, x = small_gen
    calib = calibrate_trunk(g, params, x)
    assert len(calib["in"]) == 9 and len(calib["mid"]) == 9
    for v in calib["in"] + calib["mid"]:
        assert v.shape == (128,)  # ngf*4
        assert np.all(np.isfinite(v)) and np.all(v > 0)


def _mk_task(quant):
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [64]
    cfg.tpu.serving_quant = quant
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=64)
    return task, state


def test_predict_step_int8_knob():
    task8, state = _mk_task("int8")
    taskf, _ = _mk_task("none")
    rgb = np.random.default_rng(0).random((2, 3, 64, 64), np.float32)
    task8.bind(state)
    taskf.bind(state)
    assert task8.wants_int8_serving() and not taskf.wants_int8_serving()
    p8 = task8.predict_step(rgb)
    assert task8._trunk_q is not None  # calibrated lazily on first batch
    pf = taskf.predict_step(rgb)
    assert p8.shape == pf.shape == (2, 1, 64, 64)
    assert _psnr(p8, pf) > 36.0
    # second call reuses the pack (no recalibration) and stays deterministic
    p8b = task8.predict_step(rgb)
    np.testing.assert_array_equal(p8, p8b)


def test_int8_trunk_inject_route():
    """The inject generator's trunk quantises identically: injection happens
    upstream of nd1 (generator.py), so calibration just threads ``embeds``
    through the instrumented forward."""
    g = ResnetGenerator(input_nc=3, output_nc=1, ngf=16, n_blocks=4,
                        inject=True, compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 48, 3), jnp.float32) * 0.3
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 256), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), x, e)["params"]
    calib = calibrate_trunk(g, params, x, e)
    qp = quantize_trunk(params, 4, calib)
    ref = g.apply({"params": params}, x, e, train=False)
    got = g.apply({"params": params}, x, e, train=False, trunk_q=qp)
    assert _psnr(got, ref) > 36.0


class _TinySRDataset:
    """In-memory SRPairedDataset stand-in (contract of data/SR_dataset_RGB.py)."""

    def __init__(self, n=4, hr=64, lr=16):
        self.n, self.hr, self.lr = n, hr, lr

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "lr": rng.random((3, self.lr, self.lr), dtype=np.float32),
            "hr": rng.random((3, self.hr, self.hr), dtype=np.float32),
            "s2_nir": rng.random((1, self.lr, self.lr), dtype=np.float32),
            "coords": np.zeros(2, np.float32),
            "id": f"tile_{i:03d}",
        }


def test_synthesize_pipeline_int8(tmp_path):
    import os

    from nirgan_tpu.inference.synthesize import synthesize_dataset

    task, state = _mk_task("int8")
    n = synthesize_dataset(task.bind(state), _TinySRDataset(), str(tmp_path / "out"),
                           batch_size=2, plot_dir=None, num_writers=1)
    assert n == 4
    assert task._trunk_q is not None
    files = sorted(os.listdir(tmp_path / "out"))
    assert len(files) == 4
    arr = np.load(tmp_path / "out" / files[0])["nir"]
    assert arr.dtype == np.float16 and np.all(np.isfinite(arr))


def test_synthesize_pipeline_int8_mesh(tmp_path):
    """int8 serving under the data mesh: trunk_q replicates (scalars +
    int8 kernels), tiles shard — outputs must match the single-device
    int8 run (same first-batch calibration)."""
    from nirgan_tpu.inference.synthesize import synthesize_dataset
    from nirgan_tpu.parallel import create_mesh

    outs = {}
    for name, mesh in (("single", None), ("mesh", create_mesh(("data",)))):
        task, state = _mk_task("int8")
        n = synthesize_dataset(task.bind(state), _TinySRDataset(),
                               str(tmp_path / name), batch_size=4,
                               plot_dir=None, num_writers=1, mesh=mesh)
        assert n == 4 and task._trunk_q is not None
        outs[name] = np.stack(
            [np.load(tmp_path / name / f)["nir"]
             for f in sorted(os.listdir(tmp_path / name))])
    np.testing.assert_allclose(outs["mesh"].astype(np.float32),
                               outs["single"].astype(np.float32),
                               atol=2e-3)


def test_predict_step_int8_concat_route():
    """Concat route: extract_batch attaches the embedding plane, so the
    4-ch input reaches calibration exactly as g_apply sees it."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    preds = {}
    for quant in ("int8", "none"):
        cfg = load_config("configs/config_px2px_SatCLIP.yaml")
        cfg.satclip.satclip_style = "concat"
        cfg.base_configs.ngf = 8
        cfg.base_configs.ndf = 8
        cfg.Data.padding_amount = 2
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.shape_buckets = [64]
        cfg.tpu.serving_quant = quant
        task = Px2PxTask(cfg)
        state = task.init_state(seed=0, image_size=64)
        task.bind(state)
        rgb = np.random.default_rng(0).random((2, 3, 64, 64), np.float32)
        coords = np.asarray([[9.0, 48.0], [-120.0, 35.0]], np.float32)
        preds[quant] = task.predict_step(rgb, coords=coords)
        if quant == "int8":
            assert task._trunk_q is not None
    assert _psnr(preds["int8"], preds["none"]) > 36.0


def test_int8_export_roundtrip(tmp_path):
    """jax.export of the int8 serving program: the pack rides as a runtime
    argument; the deserialized artifact reproduces the live int8 output."""
    from nirgan_tpu.inference.export import export_generator, run_exported

    task, state = _mk_task("int8")
    task.bind(state)
    rgb = np.random.default_rng(5).random((2, 3, 64, 64), np.float32)
    x_nhwc = jnp.asarray(rgb.transpose(0, 2, 3, 1))
    qp = task.build_trunk_q(state.params_g, x_nhwc)

    blob = export_generator(task, state.params_g, image_size=64, batch_size=2,
                            trunk_q=qp)
    path = tmp_path / "int8.nirgan"
    path.write_bytes(blob)
    out = np.asarray(run_exported(path.read_bytes(), state.params_g, rgb,
                                  trunk_q=qp))
    live = np.asarray(jax.jit(
        lambda p, x, q: task.g_apply(p, x, train=False, trunk_q=q))(
        state.params_g, x_nhwc, qp)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, live, atol=1e-5)


def test_int8_under_spatial_sharding():
    """int8 trunk on the H-sharded whole-tile path: the explicit IN moment
    sums all-reduce across shards (GSPMD), reflect pads halo — output must
    match the single-device int8 computation."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.parallel import create_mesh
    from nirgan_tpu.parallel.spatial import predict_large_tile
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding = False
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    params = task.init_state(seed=0, image_size=64).params_g

    rgb = np.random.default_rng(0).random((1, 3, 128, 64), dtype=np.float32)
    x_nhwc = np.transpose(rgb, (0, 2, 3, 1))
    qp = task.build_trunk_q(params, jnp.asarray(x_nhwc))

    mesh = create_mesh(("data",))
    sharded = predict_large_tile(task, params, rgb, mesh, trunk_q=qp)
    single = np.asarray(jax.jit(
        lambda p, x: task.g_apply(p, x, train=False, trunk_q=qp))(params, x_nhwc))
    single = np.transpose(single, (0, 3, 1, 2))
    # NOT bit-equality: the trunk's f32 IN-moment all-reduces reassociate
    # under GSPMD, and the per-block REquantisation amplifies any near-
    # boundary ulp difference into one-quant-step flips that cascade
    # through the 9 blocks (observed max ≈ 0.03 on the [-1,1] output).
    # The float path *is* held to bit-equality (test_spatial_sharding);
    # for int8 the robust contract is agreement within quantisation noise.
    err = float(np.max(np.abs(sharded - single)))
    assert err < 0.1, f"sharded int8 deviates beyond quant noise: {err}"
    mse = float(np.mean(np.square(sharded - single)))
    psnr = 10 * np.log10(4.0 / mse) if mse else np.inf  # range [-1,1] → 2²
    assert psnr > 40.0, f"sharded-vs-single int8 PSNR {psnr:.1f} dB"
    # and it actually ran the int8 path: differs from float, but within guard
    flt = predict_large_tile(task, params, rgb, mesh)
    assert not np.array_equal(sharded, flt)
    assert _psnr(sharded, flt) > 36.0


@pytest.mark.slow
def test_int8_trained_weights_quality(tmp_path):
    """Quality guard on *structured* weights, not just random init: briefly
    train the torch reference (the visual-parity protocol), convert, and
    bound int8-vs-float output PSNR on unseen imagery-like tiles.  Records
    the measured figure in benchmarks/parity_report.json."""
    import torch

    from tests.conftest import REPO_ROOT, load_reference_module
    from tests.test_visual_parity import (
        _imagery_like_tiles,
        _update_report,
    )

    networks = load_reference_module("model/networks.py", "ref_networks_i8")
    if networks is None:
        pytest.skip("reference checkout not present")
    torch.manual_seed(0)
    net = networks.ResnetGenerator(
        3, 1, 64, norm_layer=networks.get_norm_layer("instance"),
        use_dropout=False, n_blocks=9)
    opt = torch.optim.Adam(net.parameters(), lr=2e-4, betas=(0.5, 0.999))
    x = _imagery_like_tiles(4, 96, seed=1)
    target = (0.7 * x[:, 1:2] + 0.3 * x[:, 0:1]).clamp(0, 1) * 2 - 1
    net.train()
    for _ in range(25):
        opt.zero_grad()
        loss = torch.nn.functional.l1_loss(net(x), target)
        loss.backward()
        opt.step()
    sd = {f"netG.{k}": v for k, v in net.state_dict().items()}
    ckpt = str(tmp_path / "trainedish.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    import os as _os

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    preds = {}
    for quant in ("int8", "none"):
        cfg = load_config(_os.path.join(REPO_ROOT, "configs/config_px2px.yaml"))
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.shape_buckets = [96]
        cfg.tpu.serving_quant = quant
        task = Px2PxTask(cfg)
        state = task.init_state(seed=0, image_size=96)
        loaded = task.load_torch_weights(ckpt)
        task.bind(merge_params(jax.device_get(state.params_g),
                               loaded["params_g"]))
        # calibration batch ≠ eval batch: quality holds on unseen tiles
        task.predict_step(_imagery_like_tiles(2, 96, seed=3).numpy())
        preds[quant] = task.predict_step(_imagery_like_tiles(2, 96, seed=2).numpy())

    psnr = _psnr(preds["int8"], preds["none"])
    _update_report("int8_trained_96", {
        "setting": "torch reference generator, 25 L1 steps @96² (trained-ish), "
                   "int8 trunk vs f32 serving path, unseen tiles",
        "int8_vs_float_psnr_dB": round(float(psnr), 2),
        "max_abs_delta": round(float(np.max(np.abs(
            preds["int8"] - preds["none"]))), 6),
    })
    # measured 49.7 dB on trained weights (parity_report.json); guard at
    # measured−6 so a silent quantisation regression can't hide under the
    # generic 36 dB serving bar
    assert psnr > 43.0
