"""Full SatCLIP model tests: every positional-encoding family (parity vs the
reference implementations where importable), both vision towers, the
contrastive loss, and a pretraining step that actually reduces the loss."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.conftest import load_reference_module
from nirgan_tpu.models.satclip.model import (
    SatCLIP,
    VisionTransformer,
    ModifiedResNet,
    satclip_loss,
)
from nirgan_tpu.models.satclip.positional_encoding import (
    get_positional_encoding,
)

ref_common = load_reference_module(
    "model/satclip/positional_encoding/common.py", "ref_pe_common")


def _coords(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)], -1)


def _load_ref_pe(fname, name):
    """Load a reference PE module, faking the relative `.common` import."""
    import sys, types

    if ref_common is None:
        return None
    pkg = types.ModuleType("refpe")
    pkg.__path__ = ["/root/reference/model/satclip/positional_encoding"]
    sys.modules.setdefault("refpe", pkg)
    sys.modules["refpe.common"] = ref_common
    import importlib.util

    path = f"/root/reference/model/satclip/positional_encoding/{fname}"
    spec = importlib.util.spec_from_file_location(f"refpe.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refpe.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------- simple encoders parity

@pytest.mark.skipif(ref_common is None, reason="reference not present")
@pytest.mark.parametrize("fname,cls,ours", [
    ("direct.py", "Direct", "direct"),
    ("cartesian3d.py", "Cartesian3D", "cartesian3d"),
    ("wrap.py", "Wrap", "wrap"),
])
def test_simple_encoders_match_reference(fname, cls, ours):
    mod = _load_ref_pe(fname, cls.lower())
    ref_enc = getattr(mod, cls)()
    c = _coords()
    ref = ref_enc(torch.from_numpy(c)).numpy()
    out = np.asarray(get_positional_encoding(ours)(c))
    np.testing.assert_allclose(ref, out, rtol=1e-6, atol=1e-9)
    assert ref_enc.embedding_dim == get_positional_encoding(ours).embedding_dim


@pytest.mark.skipif(ref_common is None, reason="reference not present")
def test_theory_matches_reference():
    mod = _load_ref_pe("theory.py", "theory")
    ref_enc = mod.Theory(frequency_num=8, max_radius=360, min_radius=1)
    ours = get_positional_encoding("theory", frequency_num=8, max_radius=360,
                                   min_radius=1)
    c = _coords(12, 1)
    ref = ref_enc(torch.from_numpy(c[:, None, :])).numpy()
    out = np.asarray(ours(c))
    assert ref.shape == out.shape == (12, ours.embedding_dim)
    np.testing.assert_allclose(ref, out, rtol=1e-8)


@pytest.mark.skipif(ref_common is None, reason="reference not present")
@pytest.mark.parametrize("name", ["grid", "spherec", "spherecplus",
                                  "spherem", "spheremplus"])
def test_grid_and_sphere_matches_reference(name):
    mod = _load_ref_pe("grid_and_sphere.py", "grid_and_sphere")
    ref_enc = mod.GridAndSphere(frequency_num=4, max_radius=360, min_radius=1,
                                name=name)
    ours = get_positional_encoding(name, frequency_num=4, max_radius=360,
                                   min_radius=1)
    c = _coords(6, 2)
    ref = ref_enc(torch.from_numpy(c)).numpy()
    out = np.asarray(ours(c))
    assert out.shape[1] == ours.embedding_dim == ref_enc.embedding_dim
    np.testing.assert_allclose(ref.reshape(6, -1), out, rtol=1e-8)


def test_discretized_sh_shape_and_smoothness():
    enc = get_positional_encoding("sphericalharmonics",
                                  harmonics_calculation="discretized",
                                  legendre_polys=5)
    c = _coords(8, 3)
    out = np.asarray(enc(c))
    assert out.shape == (8, 25)
    # nearby points give nearby features (grid lookup works)
    a = np.asarray(enc(np.asarray([[10.0, 45.0]])))
    b = np.asarray(enc(np.asarray([[10.05, 45.05]])))
    assert np.abs(a - b).max() < 0.5


# ----------------------------------------------------------- vision towers

def test_vision_transformer_forward():
    vit = VisionTransformer(input_resolution=64, patch_size=16, width=64,
                            layers=2, heads=2, in_channels=4, output_dim=32)
    x = jnp.zeros((2, 64, 64, 4))
    params = vit.init(jax.random.key(0), x)["params"]
    out = vit.apply({"params": params}, x)
    assert out.shape == (2, 32)


def test_modified_resnet_forward():
    net = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=4,
                         input_resolution=64, width=32, in_channels=4)
    x = jnp.zeros((2, 64, 64, 4))
    variables = net.init(jax.random.key(0), x, False)
    out = net.apply(variables, x, False)
    assert out.shape == (2, 32)
    assert "batch_stats" in variables


# ------------------------------------------------------------ loss + train

def test_satclip_loss_matches_torch_ce():
    rng = np.random.default_rng(0)
    lpi = rng.standard_normal((6, 6)).astype(np.float32)
    t = torch.from_numpy(lpi)
    labels = torch.arange(6)
    ref = ((torch.nn.functional.cross_entropy(t, labels)
            + torch.nn.functional.cross_entropy(t.T.contiguous(), labels)) / 2).item()
    out = float(satclip_loss(jnp.asarray(lpi), jnp.asarray(lpi.T)))
    assert abs(ref - out) < 1e-5


def test_pretrain_step_learns():
    from nirgan_tpu.data.s2geo import FakeS2GeoDataset
    from nirgan_tpu.data.pipeline import Loader
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    task = SatClipPretrainTask(embed_dim=16, vision_layers=2, vision_width=32,
                               vision_patch_size=16, image_resolution=32,
                               capacity=32, learning_rate=3e-4)
    state = task.init_state(seed=0)
    step = task.make_train_step()
    ds = FakeS2GeoDataset(length=8, crop=32)
    batch = task.extract_batch(next(iter(Loader(ds, 8, drop_last=True))))
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0], losses
    # deployment view: coords → embedding
    enc = task.location_encoder(state)
    emb = np.asarray(enc(_coords(4)))
    assert emb.shape == (4, 16)


def test_pretrain_resnet_tower_batchstats():
    from nirgan_tpu.data.s2geo import FakeS2GeoDataset
    from nirgan_tpu.data.pipeline import Loader
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    task = SatClipPretrainTask(embed_dim=16, vision_layers=(1, 1, 1, 1),
                               vision_width=16, image_resolution=32, capacity=32)
    state = task.init_state(seed=0)
    assert state.batch_stats  # ResNet tower carries running stats
    step = task.make_train_step()
    ds = FakeS2GeoDataset(length=4, crop=32)
    batch = task.extract_batch(next(iter(Loader(ds, 4, drop_last=True))))
    before = jax.device_get(jax.tree.leaves(state.batch_stats)[0])
    state, m = step(state, batch)
    after = jax.device_get(jax.tree.leaves(state.batch_stats)[0])
    assert np.isfinite(float(m["train_loss"]))
    assert not np.array_equal(before, after)  # running stats updated


def test_packed_shards_match_folder_dataset(tmp_path):
    """pack_s2geo_shards → PackedS2GeoDataset reproduces the per-file
    S2GeoDataset bit-for-bit (uint16 DN round-trips exactly), and
    S2GeoDataModule auto-detects a packed folder."""
    from nirgan_tpu.data.s2geo import (PackedS2GeoDataset, S2GeoDataModule,
                                       S2GeoDataset, pack_s2geo_shards)

    rng = np.random.default_rng(17)
    src = tmp_path / "tiles"
    src.mkdir()
    for i in range(7):
        np.savez(src / f"t{i}.npz",
                 image=rng.integers(0, 10000, (4, 40, 40)).astype(np.uint16),
                 point=rng.uniform(-90, 90, 2).astype(np.float32))

    folder = S2GeoDataset(str(src), crop=32, seed=3)
    packed_dir = tmp_path / "packed"
    n_shards = pack_s2geo_shards(S2GeoDataset(str(src), augment=False,
                                              crop=1 << 30),
                                 str(packed_dir), tiles_per_shard=3)
    assert n_shards == 3  # 3 + 3 + 1
    packed = PackedS2GeoDataset(str(packed_dir), crop=32, seed=3)
    assert len(packed) == len(folder) == 7
    for i in range(7):  # same seed ⇒ identical augmentation stream
        a, b = folder[i], packed[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["point"], b["point"])

    dm = S2GeoDataModule(base_path=str(packed_dir), batch_size=2, crop=32)
    batch = next(iter(dm.train_dataloader()))
    assert batch["image"].shape == (2, 4, 32, 32)
    assert batch["point"].shape == (2, 2)


def test_pretrain_gradient_accumulation():
    """accumulate_grad_batches=K (reference trainer default 16, main.py:131):
    params update only every K-th step (optax.MultiSteps)."""
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    kw = dict(embed_dim=16, vision_layers=(1, 1, 1, 1), vision_width=8,
              image_resolution=16, legendre_polys=3)
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((2, 4, 16, 16), np.float32),
                "point": rng.uniform(-80, 80, (2, 2)).astype(np.float32)}
               for _ in range(2)]

    task = SatClipPretrainTask(accumulate_grad_batches=2, **kw)
    state = task.init_state(seed=0)
    step = task.make_train_step()
    p0 = jax.device_get(jax.tree.leaves(state.params)[0])
    state, _ = step(state, task.extract_batch(batches[0]))
    p1 = jax.device_get(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)      # accumulating, no update yet
    state, _ = step(state, task.extract_batch(batches[1]))
    p2 = jax.device_get(jax.tree.leaves(state.params)[0])
    assert not np.array_equal(p1, p2)          # K-th step applies the update


def test_pretrain_mesh_matches_single_device():
    """Sharded pretrain step (the CLI's default path) ≡ single-device."""
    from nirgan_tpu.parallel import create_mesh, replicate, shard_batch
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    kw = dict(embed_dim=16, vision_layers=(1, 1, 1, 1), vision_width=8,
              image_resolution=16, legendre_polys=3)
    rng = np.random.default_rng(1)
    batch = {"image": rng.random((8, 4, 16, 16), np.float32),
             "point": rng.uniform(-80, 80, (8, 2)).astype(np.float32)}

    t1 = SatClipPretrainTask(**kw)
    s1 = t1.init_state(seed=0)
    s1, m1 = t1.make_train_step()(s1, t1.extract_batch(batch))

    mesh = create_mesh(("data",))
    t8 = SatClipPretrainTask(**kw)
    s8 = replicate(mesh, t8.init_state(seed=0))
    s8, m8 = t8.make_train_step(mesh=mesh)(
        s8, shard_batch(mesh, t8.extract_batch(batch)))

    np.testing.assert_allclose(float(m1["train_loss"]), float(m8["train_loss"]),
                               rtol=2e-5)
    a = jax.device_get(jax.tree.leaves(s1.params)[0])
    b = jax.device_get(jax.tree.leaves(s8.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_native_pretrain_checkpoint_into_wrapper(tmp_path):
    """pretrain_satclip.py output (orbax params + hparams sidecar) loads
    back through SatClipWrapper — the reference's pretrain→inject workflow
    (load.py:3-17) done natively, no torch checkpoint involved."""
    import json

    import jax
    import orbax.checkpoint as ocp

    from nirgan_tpu.models.satclip.wrapper import SatClipWrapper
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask

    task = SatClipPretrainTask(embed_dim=16, vision_layers=2, vision_width=32,
                               vision_patch_size=16, image_resolution=32,
                               capacity=32)
    state = task.init_state(seed=0)
    out = tmp_path / "pre"
    out.mkdir()
    ck = ocp.StandardCheckpointer()
    ck.save(str(out / "satclip_ckpt"), jax.device_get(state.params), force=True)
    ck.wait_until_finished()
    with open(out / "satclip_hparams.json", "w") as f:
        json.dump({"le_type": "sphericalharmonics", "pe_type": "siren",
                   "legendre_polys": 10, "harmonics_calculation": "analytic",
                   "embed_dim": 16}, f)

    w = SatClipWrapper(str(out))
    assert w.loaded_from == str(out)
    assert w.embed_dim == 16
    coords = _coords(5)
    got = w.predict(coords)
    ref = np.asarray(task.location_encoder(state)(coords))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_fake_s2geo_geo_mode():
    """geo-mode pretraining data: the NIR channel is the coordinate-dependent
    soil/veg blend (same generative family as FakeDataset geo mode), so the
    contrastive objective has real location structure."""
    from nirgan_tpu.data.datasets import FakeDataset
    from nirgan_tpu.data.s2geo import FakeS2GeoDataset

    ds = FakeS2GeoDataset(length=4, crop=16, augment=False, mode="geo")
    it = ds[1]
    img, pt = it["image"], it["point"]
    rgb = img[:3]
    veg = np.clip(0.55 * rgb[1] - 0.25 * rgb[0] + 0.35 * rgb[2] + 0.15, 0, 1)
    soil = np.clip(0.6 * rgb[0] - 0.2 * rgb[1] + 0.3 * rgb[2] + 0.25, 0, 1)
    g = FakeDataset.geo_mix(float(pt[0]), float(pt[1]))
    np.testing.assert_allclose(img[3], (1 - g) * soil + g * veg, atol=1e-6)
