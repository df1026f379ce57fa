"""Spatial sharding for very large tiles — the conv-world analogue of
context parallelism (SURVEY.md §5.7).

The reference processes big scenes as independent tile streams
(``create_synthetic_dataset.py:100-118``); a whole-scene pass at native
resolution would not fit one accelerator.  TPU-natively a single huge tile
is sharded along H across the mesh: every convolution then needs its
neighbour rows at shard boundaries, and **GSPMD inserts exactly those halo
exchanges** (collective-permutes over ICI) when the operand carries a
spatial sharding — no hand-written ring code.  Instance-norm statistics
(full-H×W reductions) become cross-shard all-reduces, also automatic.

The result is bit-equal to the unsharded computation (asserted in
tests/test_spatial_sharding.py), so one chip's memory ceiling stops being
the scene-size ceiling.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P
from nirgan_tpu.runtime.setup import default_compiler_options

__all__ = ["spatial_predict_fn", "predict_large_tile", "spatial_predict_fn_2d",
           "predict_tiles_2d"]


def spatial_predict_fn(task, mesh, axis: str = "data"):
    """Build a jitted (params, rgb_nhwc, trunk_q) → nir_nhwc whose
    activations are H-sharded across ``axis``.  Params (and the optional
    int8 trunk pack — its IN moment sums become cross-shard all-reduces,
    like the float path's) replicated; batch stays unsharded (use the data
    axis for batch OR space, not both, on a 1-D mesh)."""
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(None, axis, None, None))

    def fn(params, rgb, trunk_q):
        pred = task.g_apply(params, rgb.astype(task.compute_dtype),
                            train=False, trunk_q=trunk_q)
        return pred.astype(np.float32)

    graph = "serve_int8" if task.serving_quant == "int8" else "serve"
    return jax.jit(fn, in_shardings=(repl, rows, repl),
                   out_shardings=rows,
                   compiler_options=default_compiler_options(graph)), rows


def spatial_predict_fn_2d(task, mesh, batch_axis: str = "data",
                          h_axis: str = "spatial"):
    """2-D mesh composition (``('data', 'spatial')``): batch parallelism and
    H-sharding at once — batch-throughput scaling *and* per-tile latency
    reduction on the same slice (ROADMAP perf bullet 3).  GSPMD emits halo
    exchanges along ``h_axis`` and nothing along ``batch_axis``; instance-
    norm stats all-reduce only across the spatial axis (they are per-sample,
    so the batch axis needs no collective)."""
    repl = NamedSharding(mesh, P())
    grid = NamedSharding(mesh, P(batch_axis, h_axis, None, None))

    def fn(params, rgb, trunk_q):
        pred = task.g_apply(params, rgb.astype(task.compute_dtype),
                            train=False, trunk_q=trunk_q)
        return pred.astype(np.float32)

    graph = "serve_int8" if task.serving_quant == "int8" else "serve"
    return jax.jit(fn, in_shardings=(repl, grid, repl),
                   out_shardings=grid,
                   compiler_options=default_compiler_options(graph)), grid


def predict_tiles_2d(task, params_g, rgb_nchw, mesh, batch_axis: str = "data",
                     h_axis: str = "spatial", trunk_q=None):
    """Run a (B, 3, H, W) batch sharded B×H over a 2-D mesh; B must divide
    the ``batch_axis`` size evenly and H must be a multiple of 4·|h_axis|
    (two stride-2 stages need even per-shard splits).  Returns (B,1,H,W)."""
    nb, nh = mesh.shape[batch_axis], mesh.shape[h_axis]
    rgb = np.asarray(rgb_nchw, np.float32)
    b, _, h, _ = rgb.shape
    if b % nb != 0:
        raise ValueError(f"B={b} must be a multiple of mesh '{batch_axis}' size {nb}")
    if h % (4 * nh) != 0:
        raise ValueError(f"H={h} must be a multiple of {4 * nh} "
                         f"(4 × mesh '{h_axis}' size {nh})")
    x = np.transpose(rgb, (0, 2, 3, 1))
    fn, grid = spatial_predict_fn_2d(task, mesh, batch_axis, h_axis)
    pred = fn(params_g, jax.device_put(x, grid), trunk_q)
    return np.transpose(np.asarray(pred), (0, 3, 1, 2))


def predict_large_tile(task, params_g, rgb_nchw, mesh, axis: str = "data",
                       trunk_q=None):
    """Run one (1, 3, H, W) tile H-sharded over the mesh; H must be a
    multiple of 4·mesh_size (the generator's two stride-2 stages need even
    splits per shard).  Returns (1, 1, H, W) numpy."""
    n = mesh.shape[axis]
    rgb = np.asarray(rgb_nchw, np.float32)
    _, _, h, w = rgb.shape
    if h % (4 * n) != 0:
        raise ValueError(f"H={h} must be a multiple of {4 * n} "
                         f"(4 × mesh '{axis}' size {n}) for spatial sharding")
    x = np.transpose(rgb, (0, 2, 3, 1))
    fn, rows = spatial_predict_fn(task, mesh, axis)
    xd = jax.device_put(x, rows)
    pred = fn(params_g, xd, trunk_q)
    return np.transpose(np.asarray(pred), (0, 3, 1, 2))
