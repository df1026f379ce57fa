"""Reflect-pad folding (ops/reflect_conv.py) is exact.

The fold replaces ``conv(reflect_pad(x, p), k)`` with a zero-SAME conv
plus exactly recomputed border strips (the reflect pad of a large tensor
is a sublane relayout + fusion barrier measured at ~28% of the generator
fwd+bwd in context — benchmarks/padfold_ab.py).  Interior values are the
same conv on the same inputs; borders are the same contraction in a
separate small conv, so f32 forward agreement is exact and gradients
agree to reassociation error.

Reference pattern: model/networks.py:341,406 (ReflectionPad2d → Conv2d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nirgan_tpu.models.generator import ResnetGenerator
from nirgan_tpu.ops.blocked_stem import conv_valid_blocked
from nirgan_tpu.ops.conv import conv2d
from nirgan_tpu.ops.pad import reflect_pad2d
from nirgan_tpu.ops.reflect_conv import conv2d_reflect, conv_valid_blocked_reflect


@pytest.mark.parametrize(
    "h,w,cin,cout,k,p",
    [
        (69, 69, 16, 16, 3, 1),   # trunk shape class
        (20, 24, 8, 16, 3, 1),    # rectangular
        (33, 35, 4, 4, 7, 3),     # head kernel class, odd dims
        (40, 40, 6, 1, 7, 3),     # Cout=1 head
        (5, 5, 3, 3, 3, 1),       # fallback (too small for strips)
        (7, 13, 3, 2, 7, 3),      # fallback, rectangular
    ],
)
def test_conv2d_reflect_exact(h, w, cin, cout, k, p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, h, w, cin), np.float32))
    kern = jnp.asarray(rng.random((k, k, cin, cout), np.float32) * 0.1)
    bias = jnp.asarray(rng.random((cout,), np.float32))
    ref = conv2d(reflect_pad2d(x, p), kern, bias)
    got = conv2d_reflect(x, kern, bias, pad=p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("h,w,f", [(68, 72, 4), (66, 70, 2), (40, 40, 4)])
def test_blocked_reflect_exact(h, w, f):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, h, w, 8), np.float32))
    k7 = jnp.asarray(rng.random((7, 7, 8, 1), np.float32) * 0.1)
    bias = jnp.asarray(rng.random((1,), np.float32))
    ref = conv_valid_blocked(reflect_pad2d(x, 3), k7, bias, factor=f)
    got = conv_valid_blocked_reflect(x, k7, bias, factor=f)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("h,w,kh,outer", [
    (40, 40, 7, 0), (66, 70, 7, 0), (12, 16, 3, 0), (6, 6, 7, 0),
    (40, 40, 7, 10),  # the task-level pad-10 composed with the stem pad-3
    (34, 38, 7, 10),  # rectangular composed
    (38, 42, 7, 3),   # odd outer pad
    (12, 12, 7, 10),  # composed fallback (strips would overlap)
])
def test_stem_blocked_reflect_exact(h, w, kh, outer):
    """stem_downsample_blocked_reflect ≡ stem_downsample_blocked on the
    (composed-)reflect-padded input (incl. too-small fallback shapes).
    reflect∘reflect ≠ a single deeper reflect, so the outer cases verify
    the composed index maps."""
    from nirgan_tpu.ops.blocked_stem import stem_downsample_blocked
    from nirgan_tpu.ops.reflect_conv import stem_downsample_blocked_reflect

    rng = np.random.default_rng(4)
    p = (kh - 1) // 2
    x = jnp.asarray(rng.random((2, h, w, 3), np.float32))
    k7 = jnp.asarray(rng.random((kh, kh, 3, 8), np.float32) * 0.1)
    b7 = jnp.asarray(rng.random((8,), np.float32))
    k3 = jnp.asarray(rng.random((3, 3, 8, 16), np.float32) * 0.1)
    b3 = jnp.asarray(rng.random((16,), np.float32))
    ref = stem_downsample_blocked(
        reflect_pad2d(reflect_pad2d(x, outer), p), k7, b7, k3, b3)
    got = stem_downsample_blocked_reflect(x, k7, b7, k3, b3, outer=outer)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fold_serve_env_knob_exact(monkeypatch):
    """NIRGAN_FOLD_SERVE=1 (the serve-side trunk-fold experiment,
    benchmarks/servefold_ab.py) must not change serving outputs."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 40, 40, 3), np.float32))
    m = ResnetGenerator(input_nc=3, output_nc=1, ngf=8, n_blocks=2)
    params = m.init(jax.random.PRNGKey(0), x[:1])
    ref = m.apply(params, x)
    monkeypatch.setenv("NIRGAN_FOLD_SERVE", "1")
    got = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_composed_reflect_idx_matches_jnp():
    from nirgan_tpu.ops.pad import composed_reflect_idx

    rng = np.random.default_rng(5)
    v = rng.random(17)
    for pads in [(3,), (10, 3), (1, 3), (5, 2, 1)]:
        ref = v
        for p in pads:
            ref = np.pad(ref, p, mode="reflect")
        got = v[composed_reflect_idx(17, pads)]
        np.testing.assert_array_equal(got, ref)


def test_task_outer_pad_fold_matches_explicit():
    """g_apply with the folded outer pad (opt-in fold_input_pads=True) ≡
    the default explicit reflect-pad path, for both even and odd
    (fallback) sizes."""
    from tests.test_train_step import small_config

    from nirgan_tpu.tasks import Px2PxTask

    cfg = small_config()
    cfg.Data.padding = True
    cfg.Data.padding_amount = 4
    task = Px2PxTask(cfg)
    task.netG = task.netG.clone(fold_input_pads=True)  # opt-in fold
    state = task.init_state(seed=0, image_size=32)
    cfg2 = small_config()
    cfg2.Data.padding = True
    cfg2.Data.padding_amount = 4
    task2 = Px2PxTask(cfg2)  # default: explicit pads

    rng = np.random.default_rng(6)
    for hw in (32, 31):
        x = jnp.asarray(rng.random((2, hw, hw, 3), np.float32))
        a = task.g_apply(state.params_g, x)
        b = task2.g_apply(state.params_g, x)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def test_conv2d_reflect_grads_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 18, 20, 6), np.float32))
    kern = jnp.asarray(rng.random((3, 3, 6, 6), np.float32) * 0.1)
    ct = jnp.asarray(rng.random((2, 18, 20, 6), np.float32))

    def loss_ref(x, k):
        return jnp.sum(conv2d(reflect_pad2d(x, 1), k) * ct)

    def loss_fold(x, k):
        return jnp.sum(conv2d_reflect(x, k, pad=1) * ct)

    gx0, gk0 = jax.grad(loss_ref, (0, 1))(x, kern)
    gx1, gk1 = jax.grad(loss_fold, (0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0),
                               rtol=0, atol=1e-3)


@pytest.mark.parametrize(
    "h,w,blocked", [(40, 40, True), (40, 40, False), (37, 41, True)]
)
def test_generator_fold_equivalence(h, w, blocked):
    """Full generator, fold on vs off: identical forward (f32), matching
    parameter gradients — covers trunk blocks, stem paths, and both head
    routes (blocked factor-4/2 and the odd-size unblocked fallback)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, h, w, 3), np.float32))
    kw = dict(input_nc=3, output_nc=1, ngf=8, n_blocks=2,
              blocked_stem=blocked)
    m_fold = ResnetGenerator(reflect_fold=True, **kw)
    m_ref = ResnetGenerator(reflect_fold=False, **kw)
    params = m_ref.init(jax.random.PRNGKey(0), x[:1])

    # serving (train=False): the trunk fold is train-gated, the blocked
    # head fold stays on — outputs must still match the unfolded model
    y_ref = m_ref.apply(params, x)
    y_fold = m_fold.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=0, atol=1e-5)

    # training (train=True): every fold active; interior bit-identical,
    # borders agree to f32 reassociation
    y_ref_t = m_ref.apply(params, x, train=True)
    y_fold_t = m_fold.apply(params, x, train=True)
    np.testing.assert_allclose(np.asarray(y_fold_t), np.asarray(y_ref_t),
                               rtol=0, atol=1e-5)

    ct = jnp.asarray(rng.random(y_ref.shape, np.float32))
    g_ref = jax.grad(
        lambda p: jnp.sum(m_ref.apply(p, x, train=True) * ct))(params)
    g_fold = jax.grad(
        lambda p: jnp.sum(m_fold.apply(p, x, train=True) * ct))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fold),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
