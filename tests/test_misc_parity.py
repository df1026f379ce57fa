"""Smaller parity items: get_scheduler LR policies vs torch, CLC plots,
legacy D-loss flag, S2Geo transforms."""

import numpy as np
import pytest
import torch

from nirgan_tpu.train.scheduler import get_scheduler


class _Opt:
    lr_policy = "linear"
    epoch_count = 1
    n_epochs = 10
    n_epochs_decay = 10
    lr_decay_iters = 3


def test_linear_policy_matches_torch_lambda():
    base_lr = 0.1
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)

    def lambda_rule(epoch):
        return 1.0 - max(0, epoch + _Opt.epoch_count - _Opt.n_epochs) / float(_Opt.n_epochs_decay + 1)

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda_rule)
    ours = get_scheduler("linear", base_lr, n_epochs=10, n_epochs_decay=10,
                         epoch_count=1)
    for epoch in range(20):
        assert abs(opt.param_groups[0]["lr"] - ours(epoch)) < 1e-9, epoch
        sched.step()


def test_step_policy_matches_torch():
    base_lr = 0.1
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
    ours = get_scheduler("step", base_lr, lr_decay_iters=3)
    for epoch in range(10):
        assert abs(opt.param_groups[0]["lr"] - ours(epoch)) < 1e-12
        sched.step()


def test_cosine_policy_matches_torch():
    base_lr = 0.1
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10, eta_min=0)
    ours = get_scheduler("cosine", base_lr, n_epochs=10)
    for epoch in range(10):
        assert abs(opt.param_groups[0]["lr"] - ours(epoch)) < 1e-9
        sched.step()


def test_plateau_policy():
    ours = get_scheduler("plateau", 1.0, plateau_patience=1)
    lr = ours(0, metric=1.0)
    lr = ours(1, metric=1.0)
    lr = ours(2, metric=1.0)   # bad > patience → 0.2×
    assert lr == pytest.approx(0.2)


def test_unknown_policy_raises():
    with pytest.raises(NotImplementedError):
        get_scheduler("exotic", 0.1)


def test_clc_plots(tmp_path):
    from nirgan_tpu.utils.plot_clc import plot_rgb_and_mask, plot_rgb_nir_and_mask

    rng = np.random.default_rng(0)
    rgb = rng.random((3, 32, 32), dtype=np.float32) * 0.2
    nir = rng.random((1, 32, 32), dtype=np.float32)
    mask = rng.integers(0, 5, (32, 32))
    img = plot_rgb_nir_and_mask(rgb, nir, nir, mask, it=1, out_dir=str(tmp_path / "a"))
    assert img.size[0] > 100 and (tmp_path / "a" / "clc_mask_1.png").exists()
    img2 = plot_rgb_and_mask(rgb, mask, it=2, out_dir=str(tmp_path / "b"))
    assert img2.size[0] > 100


def test_legacy_halve_d_loss_flag():
    import jax
    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"

    rng = np.random.default_rng(0)
    batch = {"rgb": rng.random((2, 3, 32, 32), dtype=np.float32),
             "nir": rng.random((2, 1, 32, 32), dtype=np.float32)}

    losses = {}
    for legacy in (False, True):
        cfg.base_configs.legacy_halve_d_loss = legacy
        task = Px2PxTask(cfg)
        state = task.init_state(seed=0, image_size=32)
        _, m = task.make_train_step()(state, task.extract_batch(batch))
        losses[legacy] = float(m["model_loss/discriminator_loss"])
    assert losses[True] == pytest.approx(losses[False] * 0.5, rel=1e-5)


def test_s2geo_transforms_jitter_and_crop():
    from nirgan_tpu.data.s2geo import train_transform

    rng = np.random.default_rng(0)
    item = {"image": rng.random((4, 80, 80), dtype=np.float32),
            "point": np.asarray([10.0, 50.0], np.float32)}
    out = train_transform(item, np.random.default_rng(1), crop=64)
    assert out["image"].shape == (4, 64, 64)
    assert np.all(np.abs(out["point"] - item["point"]) <= 0.01 + 1e-6)
    assert not np.array_equal(out["point"], item["point"])


def test_baseline_torch_warm_start(tmp_path):
    """Baseline warm start from reference-layout Lightning ckpts: forward
    parity for all three baseline nets (closes tasks/baseline.py's former
    NotImplementedError; reference mechanism train.py:61-65)."""
    import torch
    import torch.nn as tnn

    from nirgan_tpu.config import load_config
    from nirgan_tpu.tasks.baseline import BaselineTask

    torch.manual_seed(3)

    class LinearRef(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear = tnn.Linear(3, 1)

        def forward(self, x):
            b, c, h, w = x.shape
            y = self.linear(x.permute(0, 2, 3, 1).reshape(-1, 3))
            return y.reshape(b, h, w, 1).permute(0, 3, 1, 2)

    class MLPRef(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = tnn.Sequential(tnn.Linear(3, 64), tnn.ReLU(),
                                      tnn.Linear(64, 64), tnn.ReLU(),
                                      tnn.Linear(64, 1))

        def forward(self, x):
            b, c, h, w = x.shape
            y = self.mlp(x.permute(0, 2, 3, 1).reshape(-1, 3))
            return y.reshape(b, h, w, 1).permute(0, 3, 1, 2)

    class CNNRef(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(32, 64, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(64, 1, 3, padding=1))

        def forward(self, x):
            return self.net(x)

    rng = np.random.default_rng(4)
    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    for name, cls in (("Linear_NIR", LinearRef), ("MLP_NIR", MLPRef),
                      ("CNN_NIR", CNNRef)):
        net = cls().eval()
        path = str(tmp_path / f"{name}.ckpt")
        torch.save({"state_dict": net.state_dict()}, path)
        with torch.no_grad():
            want = net(torch.from_numpy(x)).numpy()

        cfg = load_config("configs/config_baselines.yaml")
        cfg.base_configs.model_name = name
        cfg.tpu.compute_dtype = "float32"  # parity mode
        cfg.Data.dataset_type = "fake"
        cfg.Data.fake_settings = {"image_size": 16, "length": 8}
        task = BaselineTask(cfg)
        loaded = task.load_torch_weights(path)
        task.bind(loaded["params_g"])
        got = task.predict_step(x)
        np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)
