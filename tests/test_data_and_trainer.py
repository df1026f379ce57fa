"""Data layer, scheduler, checkpointing, and full trainer-loop smoke tests
(all on the virtual CPU mesh)."""

import glob
import json
import os

import numpy as np
import pytest

import jax

from nirgan_tpu.config import load_config
from nirgan_tpu.data import dataset_selector
from nirgan_tpu.data.datasets import ArrayDataset, FakeDataset, MixedDataset, NpzFolderDataset
from nirgan_tpu.data.pipeline import Loader, collate
from nirgan_tpu.data.normalise import minmax_percentile
from nirgan_tpu.train.checkpoint import CheckpointManager, merge_params
from nirgan_tpu.train.scheduler import ReduceLROnPlateau
from nirgan_tpu.tasks import Px2PxTask


def _cfg(tmp=None, satclip=False):
    cfg = load_config("configs/config_px2px_SatCLIP.yaml" if satclip
                      else "configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.Data.train_batch_size = 8
    cfg.Data.val_batch_size = 8
    cfg.Data.num_workers = 2
    cfg.Data.fake_settings.image_size = 32
    cfg.Data.fake_settings.length = 32
    cfg.tpu.compute_dtype = "float32"
    cfg.custom_configs.Logging.num_val_images = 1
    cfg.custom_configs.experimentation = {"save_val_df": False}
    return cfg


# ------------------------------------------------------------------- data


@pytest.mark.parametrize("path", sorted(glob.glob("configs/*.yaml")))
def test_every_shipped_config_loads(path):
    """Every YAML under configs/ parses into a complete Config — catches a
    new config shipping with a schema typo (the reference has no schema
    check at all; its configs fail at first attribute access)."""
    cfg = load_config(path)
    assert cfg.Data.train_batch_size >= 1
    # baseline configs omit satclip entirely; plain ones omit the style key
    sat = getattr(cfg, "satclip", None)
    if sat is not None and sat.use_satclip:
        assert sat.satclip_style in ("inject", "concat")

def test_fake_dataset_contract():
    ds = FakeDataset(image_size=64, length=10, return_coords=True)
    item = ds[3]
    assert item["rgb"].shape == (3, 64, 64) and item["rgb"].dtype == np.float32
    assert item["nir"].shape == (1, 64, 64)
    assert item["coords"].shape == (2,)
    assert 0 <= item["rgb"].min() and item["rgb"].max() <= 1
    np.testing.assert_array_equal(ds[3]["rgb"], item["rgb"])  # deterministic


def test_loader_batching_and_workers():
    ds = FakeDataset(image_size=16, length=20)
    dl = Loader(ds, batch_size=8, shuffle=True, num_workers=3, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    assert batches[0]["rgb"].shape == (8, 3, 16, 16)
    # shuffling differs between epochs
    b2 = list(dl)
    assert not np.array_equal(batches[0]["rgb"], b2[0]["rgb"])


def test_device_feed_threaded_matches_inline():
    """depth>=1 (producer-thread prefetch, tpu.prefetch_depth) must deliver
    the same batches in the same order as the inline double-buffered feed,
    and re-raise producer exceptions on the consumer."""
    from nirgan_tpu.data.pipeline import DeviceFeed

    ds = FakeDataset(image_size=16, length=24)
    mk = lambda: Loader(ds, batch_size=4, shuffle=True, seed=7, drop_last=True)
    prepare = lambda b: jax.device_put(b["rgb"])
    inline = [np.asarray(x) for x in DeviceFeed(mk(), prepare, depth=0)]
    threaded = [np.asarray(x) for x in DeviceFeed(mk(), prepare, depth=2)]
    assert len(inline) == len(threaded) == 6
    for a, b in zip(inline, threaded):
        np.testing.assert_array_equal(a, b)

    def boom(b):
        raise RuntimeError("prepare failed")

    with pytest.raises(RuntimeError, match="prepare failed"):
        list(DeviceFeed(mk(), boom, depth=2))


def test_trainer_prefetch_depth(tmp_path):
    """Full trainer loop with the threaded device feed: sharding happens on
    the producer thread, metrics and checkpoints unchanged."""
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    cfg.tpu.prefetch_depth = 2
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    tr = Trainer(task, dm, cfg, logdir=str(tmp_path / "exp"), max_steps=6,
                 limit_val_batches=1, log_every=3)
    assert tr.prefetch_depth == 2
    state = tr.fit()
    assert int(jax.device_get(state.step)) == 6
    lines = [json.loads(l) for l in open(tmp_path / "exp" / "metrics.jsonl")]
    gl = [l["model_loss/generator_total_loss"] for l in lines
          if "model_loss/generator_total_loss" in l]
    assert gl and all(np.isfinite(v) for v in gl)


def test_npz_folder_dataset(tmp_path):
    for i in range(4):
        rgbn = (np.random.default_rng(i).random((4, 40, 40)) * 10000).astype(np.uint16)
        np.savez(tmp_path / f"tile{i}.npz", image=rgbn,
                 coords=np.asarray([10.0 + i, 50.0], np.float32))
    ds = NpzFolderDataset(str(tmp_path), image_size=32, return_coords=True)
    item = ds[0]
    assert item["rgb"].shape == (3, 32, 32)
    assert item["nir"].shape == (1, 32, 32)
    assert item["rgb"].max() <= 1.0  # DN/10000 scaling


def test_mixed_dataset_and_selector():
    cfg = _cfg()
    cfg.Data.dataset_type = ["fake", "fake"]
    dm = dataset_selector(cfg)
    assert len(dm.train_ds) == 64
    batch = next(iter(dm.train_dataloader()))
    assert batch["rgb"].shape == (8, 3, 32, 32)


def test_collate_strings():
    out = collate([{"id": "a", "x": np.zeros(2)}, {"id": "b", "x": np.ones(2)}])
    assert out["id"] == ["a", "b"] and out["x"].shape == (2, 2)


def test_minmax_percentile():
    x = np.linspace(0, 10, 1000).reshape(10, 100)
    y = minmax_percentile(x, 2)
    assert y.min() == 0.0 and y.max() == 1.0


# -------------------------------------------------------------- scheduler

def test_plateau_scheduler_torch_semantics():
    s = ReduceLROnPlateau(patience=2, factor=0.1)
    lr = 1.0
    lr = s.step(1.0, lr)   # best
    lr = s.step(1.0, lr)   # bad 1 (not < best*(1-1e-4))
    lr = s.step(1.0, lr)   # bad 2
    assert lr == 1.0
    lr = s.step(1.0, lr)   # bad 3 > patience → reduce
    assert lr == pytest.approx(0.1)
    lr = s.step(0.5, lr)   # improvement resets
    assert lr == pytest.approx(0.1)


# ------------------------------------------------------------ checkpoints

def test_checkpoint_best_last_and_restore(tmp_path):
    task = Px2PxTask(_cfg())
    state = task.init_state(seed=0, image_size=32)
    mgr = CheckpointManager(str(tmp_path), monitor="val/L1", mode="min")
    assert mgr.save(state, {"val/L1": 0.5})       # first → best
    assert not mgr.save(state.replace(step=state.step + 1), {"val/L1": 0.9})
    assert mgr.save(state.replace(step=state.step + 2), {"val/L1": 0.1})
    template = task.init_state(seed=1, image_size=32)
    restored = mgr.restore(template, "best")
    assert int(restored.step) == 2
    # last has step 2 as well (saved after best)
    assert int(mgr.restore(template, "last").step) == 2


def test_merge_params_partial_restore():
    task = Px2PxTask(_cfg())
    a = task.init_state(seed=0, image_size=32).params_g
    b = task.init_state(seed=1, image_size=32).params_g
    partial = {"c0": jax.device_get(b["c0"]), "bogus": {"x": np.zeros(3)},
               "d0": {"kernel": np.zeros((9, 9, 9, 9))}}  # wrong shape → skipped
    merged = merge_params(jax.device_get(a), partial)
    np.testing.assert_array_equal(merged["c0"]["kernel"], jax.device_get(b["c0"]["kernel"]))
    np.testing.assert_array_equal(merged["d0"]["kernel"], jax.device_get(a["d0"]["kernel"]))
    assert "bogus" not in merged


# ---------------------------------------------------------------- trainer

def test_trainer_fit_end_to_end(tmp_path):
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    tr = Trainer(task, dm, cfg, logdir=str(tmp_path / "exp"), max_steps=9,
                 limit_val_batches=1, log_every=3)
    state = tr.fit()
    assert int(jax.device_get(state.step)) == 9

    lines = [json.loads(l) for l in open(tmp_path / "exp" / "metrics.jsonl")]
    keys = set().union(*[set(l) for l in lines])
    assert "model_loss/generator_total_loss" in keys
    assert "val/L1" in keys and "perf/images_per_sec" in keys
    assert "lr/G" in keys
    assert (tmp_path / "exp" / "config.yaml").exists()          # epoch-1 snapshot
    assert (tmp_path / "exp" / "last").is_dir()                  # orbax ckpt
    assert glob.glob(str(tmp_path / "exp" / "images" / "*.png"))  # val panels

    # resume: restore last and continue
    cfg.custom_configs.Model.load_checkpoint = True
    tr2 = Trainer(task, dm, cfg, logdir=str(tmp_path / "exp"), max_steps=12,
                  limit_val_batches=1, log_every=3)
    state2 = tr2.fit()
    assert int(jax.device_get(state2.step)) == 12


def test_trainer_baseline(tmp_path):
    from nirgan_tpu.tasks.baseline import BaselineTask
    from nirgan_tpu.train.trainer import Trainer

    cfg = load_config("configs/config_baselines.yaml")
    cfg.Data.dataset_type = "fake"
    cfg.Data.fake_settings = {"image_size": 32, "length": 32}
    cfg.Data.train_batch_size = 8
    cfg.Data.val_batch_size = 8
    cfg.custom_configs.experimentation = {"save_val_df": False}
    task = BaselineTask(cfg)
    dm = dataset_selector(cfg)
    tr = Trainer(task, dm, cfg, logdir=str(tmp_path / "b"), max_steps=8,
                 limit_val_batches=1, log_every=4)
    state = tr.fit()
    assert int(jax.device_get(state.step)) == 8
    lines = [json.loads(l) for l in open(tmp_path / "b" / "metrics.jsonl")]
    assert any("train/loss" in l for l in lines)


def test_trainer_step_based_validation(tmp_path):
    """val_check_interval: validation (and plateau scheduling, checkpoints)
    run on a step cadence mid-epoch instead of at epoch end."""
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    tr = Trainer(task, dm, cfg, logdir=str(tmp_path / "sv"), max_steps=7,
                 limit_val_batches=1, log_every=100, val_check_interval=3)
    state = tr.fit()
    assert int(jax.device_get(state.step)) == 7

    lines = [json.loads(l) for l in open(tmp_path / "sv" / "metrics.jsonl")]
    val_steps = [l["step"] for l in lines if "val/L1" in l]
    assert val_steps == [3, 6]  # mid-epoch cadence, no epoch-end double-run
    assert (tmp_path / "sv" / "config.yaml").exists()  # first-validation snapshot
    assert (tmp_path / "sv" / "last").is_dir()


def test_loader_multihost_input_sharding():
    """Per-process input sharding: identical epoch permutation on every
    host, strided disjoint slices, full cover, per-host batch size kept."""
    from nirgan_tpu.data.pipeline import Loader

    class _Ds:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"v": np.asarray([i])}

    seen = []
    for pi in range(3):
        ld = Loader(_Ds(), batch_size=4, shuffle=True, seed=7,
                    process_index=pi, process_count=3)
        batches = list(ld)
        assert len(ld) == 2 and len(batches) == 2
        assert all(b["v"].shape == (4, 1) for b in batches)
        seen.append(np.concatenate([b["v"].ravel() for b in batches]))
    allv = np.concatenate(seen)
    assert len(np.unique(allv)) == len(allv)  # disjoint across hosts


def test_clean_checkpoint_strips_keys(tmp_path):
    import torch

    from nirgan_tpu.train.torch_convert import clean_checkpoint, load_torch_state_dict

    path = str(tmp_path / "c.ckpt")
    torch.save({"state_dict": {"keep": torch.ones(2), "drop": torch.zeros(1)}}, path)
    clean_checkpoint(path, unexpected_keys=["drop", "absent"])
    sd = load_torch_state_dict(path)
    assert sorted(sd) == ["keep"]


def test_trainer_resume_by_path(tmp_path):
    """Reference resume semantics (train.py:67-71): Model.load_checkpoint as
    a PATH to the previous run dir (or its last/ subdir) — no explicit
    logdir needed; the run continues in the same experiment dir."""
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    run = str(tmp_path / "run")
    tr = Trainer(task, dm, cfg, logdir=run, max_steps=4,
                 limit_val_batches=1, log_every=2)
    tr.fit()
    assert tr.ckpt.has("last")

    cfg.custom_configs.Model.load_checkpoint = os.path.join(run, "last")
    tr2 = Trainer(task, dm, cfg, max_steps=8,
                  limit_val_batches=1, log_every=2)
    assert os.path.abspath(tr2.logdir) == os.path.abspath(run)
    state = tr2.fit()
    assert int(jax.device_get(state.step)) == 8


def test_trainer_resume_restores_sched_state(tmp_path):
    """Full resume must restore the plateau-scheduler counters (PL restores
    lr-scheduler state with the checkpoint): a preempted run that reset
    best/num_bad would silently restart the patience window."""
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    run = str(tmp_path / "run")
    tr = Trainer(task, dm, cfg, logdir=run, max_steps=4,
                 limit_val_batches=1, log_every=2)
    tr.fit()
    # simulate an in-flight patience window at checkpoint time; the
    # counters are stored per checkpoint kind (resuming 'best' must not
    # pick up a later 'last' state — PL keeps them inside the ckpt)
    tr.sched_g.best = 0.2
    tr.sched_g.num_bad_epochs = 0
    tr._save_sched_state("best")
    tr.sched_g.best = 0.123
    tr.sched_g.num_bad_epochs = 3
    tr.sched_d.best = 0.456
    tr._save_sched_state("last")
    assert os.path.exists(os.path.join(run, "sched_state_last.json"))
    assert os.path.exists(os.path.join(run, "sched_state_best.json"))

    cfg.custom_configs.Model.load_checkpoint = os.path.join(run, "last")
    tr2 = Trainer(task, dm, cfg, max_steps=8,
                  limit_val_batches=1, log_every=2)
    size = dm.train_ds[0]["rgb"].shape[-1]
    tr2._initial_state(image_size=size)
    assert tr2.sched_g.best == 0.123
    assert tr2.sched_g.num_bad_epochs == 3
    assert tr2.sched_d.best == 0.456

    # resuming 'best' restores the best-time counters, not the later ones
    cfg.custom_configs.Model.load_checkpoint = os.path.join(run, "best")
    tr3 = Trainer(task, dm, cfg, max_steps=8,
                  limit_val_batches=1, log_every=2)
    tr3._initial_state(image_size=size)
    assert tr3.sched_g.best == 0.2
    assert tr3.sched_g.num_bad_epochs == 0


def test_trainer_resume_path_validation(tmp_path):
    """An explicit load_checkpoint path must resume or fail loudly — never
    silently start fresh in (and overwrite) the old run dir; .../best
    resumes the BEST checkpoint."""
    from nirgan_tpu.train.trainer import Trainer

    cfg = _cfg()
    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    run = str(tmp_path / "run")
    tr = Trainer(task, dm, cfg, logdir=run, max_steps=4,
                 limit_val_batches=1, log_every=2)
    tr.fit()
    assert tr.ckpt.has("best") and tr.ckpt.has("last")

    # typo / missing checkpoint → loud failure at construction
    cfg.custom_configs.Model.load_checkpoint = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        Trainer(task, dm, cfg, max_steps=8)

    # .../best resumes the best checkpoint even with 'last' removed
    import shutil

    shutil.rmtree(os.path.join(run, "last"))
    cfg.custom_configs.Model.load_checkpoint = os.path.join(run, "best")
    tr2 = Trainer(task, dm, cfg, max_steps=6, limit_val_batches=1,
                  log_every=2)
    state = tr2.fit()
    assert int(jax.device_get(state.step)) == 6


def test_fake_geo_mode_needs_coordinates():
    """mode='geo' carries real geographic signal: a per-pixel least-squares
    fit on RGB alone hits an irreducible error, and adding the (hidden)
    mixing factor g(lon,lat) as a feature removes most of it — the dataset
    property the SatCLIP inject-vs-plain A/B rests on."""
    ds = FakeDataset(image_size=32, length=48, seed=3, mode="geo")
    X, Xg, Y = [], [], []
    for i in range(len(ds)):
        it = ds[i]
        rgb = it["rgb"].reshape(3, -1).T
        g = FakeDataset.geo_mix(float(it["coords"][0]), float(it["coords"][1]))
        ones = np.ones((rgb.shape[0], 1), np.float32)
        X.append(np.concatenate([rgb, ones], 1))
        Xg.append(np.concatenate(
            [rgb, rgb * g, np.full_like(ones, g), ones], 1))
        Y.append(it["nir"].ravel())
    X, Xg, Y = np.concatenate(X), np.concatenate(Xg), np.concatenate(Y)

    def resid(A):
        w, *_ = np.linalg.lstsq(A, Y, rcond=None)
        return float(np.mean(np.abs(A @ w - Y)))

    l1_rgb, l1_geo = resid(X), resid(Xg)
    # RGB-only irreducible gap is large; the g-aware fit removes >75% of it
    assert l1_rgb > 0.02, l1_rgb
    assert l1_geo < 0.25 * l1_rgb, (l1_rgb, l1_geo)

    # deterministic per index, and coords actually modulate the target
    it2 = FakeDataset(image_size=32, length=48, seed=3, mode="geo")[0]
    np.testing.assert_array_equal(it2["nir"], ds[0]["nir"])
    np.testing.assert_array_equal(it2["coords"], ds[0]["coords"])
