"""Honest per-op ledger of the PRODUCTION fused train step (256², b32).

Companion to convgrad_probe.py (generic shapes).  This probe times the
exact ops the fused step runs — the blocked stem/d0/head forms
(ops/blocked_stem.py), the real NLayer-D tower shapes (256², 4-ch pair
input), and the big instance-norms/pads — with the same floor-corrected
K-per-dispatch chaining (a ~3-5 ms axon dispatch floor swamps single-op
timings; see convgrad_probe.py docstring).  Floor variance between runs
is ±2 ms, so sub-ms rows carry ±(2/K) ms error — trust the big rows.

It also A/Bs candidate reformulations of the step's measured pathologies
(first full run, 2026-08-20, b32 floor-corrected):

  u1 bwd      dx 4.30 ms (20.9 TF/s) + dw 4.86 ms (18.5 TF/s)
  head bwd    dx 2.96 ms (10.5)      + dw 1.67 ms (18.6)
  pad3 @276²  fwd 3.89 ms            + bwd 7.89 ms  (312 MB tensor!)

u1's grad-input is a 3×3/s2 64→128 conv @276² — the same slow stride-2
shape as the unblocked d0 (19.5 TF/s, convgrad_probe).  Candidate fixes,
all math-identical:

  dx: (a) direct stride-2 conv (XLA's own derivative form)
      (b) 4-parity decomposition — 4 strided slices + 4 stride-1 convs
      (c) im2col: 9 strided slices → concat(576ch) → 1×1 conv (pure MXU)
  dw: (a) direct (XLA's derived contraction)
      (c) im2col: patches(ct) ⊗ z as one dot_general

Run on the TPU: python benchmarks/trainledger_probe.py [--batch 32]
                [--only ledger|u1|pad]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8  # op applications per dispatch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=K, help="ops per dispatch")
    ap.add_argument("--only", default="", choices=["", "ledger", "u1", "pad"],
                    help="run one section (default: all)")
    args = ap.parse_args()
    k_per = args.k

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nirgan_tpu.ops import instance_norm, reflect_pad2d
    from nirgan_tpu.ops.blocked_stem import (
        _blocked_down_kernel,
        _strided_blocked_kernel,
        instance_norm_blocked,
    )

    B = args.batch
    rng = np.random.default_rng(0)
    EPS = jnp.bfloat16(1e-8)
    _DIMSPEC = ("NHWC", "HWIO", "NHWC")

    def want(tag):
        return not args.only or args.only == tag

    def timed(fn, fargs, iters=args.iters):
        acc = fn(*fargs, jnp.zeros((), jnp.float32))
        float(acc)  # compile + sync
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*fargs, acc)
        assert np.isfinite(float(acc))
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def null_op(acc):
        return acc + 1.0

    floor = timed(null_op, ())
    print(f"dispatch floor (null op): {floor*1e3:.2f} ms/dispatch "
          f"(K={k_per}/dispatch)", flush=True)

    def chk(t):
        # full reduce: a sliced checksum lets XLA slice the op itself
        # (convgrad_probe.py history)
        return jnp.sum(t.astype(jnp.float32))

    def bf16(*shape, scale=1.0):
        return jnp.asarray(rng.random(shape, np.float32) * scale, jnp.bfloat16)

    def probe_fn(name, f, primal_args, ct=None, flops=None, mode="fwd"):
        """Time K chained applications of f (fwd) or its vjp pull (dx/dw)."""
        if mode == "fwd":
            @jax.jit
            def run(args_, acc):
                x = args_[0]
                s = jnp.zeros((), jnp.float32)
                for _ in range(k_per):
                    y = f(x, *args_[1:])
                    s = s + chk(y)
                    x = x + EPS * s.astype(x.dtype)
                return acc + s
        else:
            argnum = {"dx": 0, "dw": 1}[mode]

            @jax.jit
            def run(args_, ct_, acc):
                s = jnp.zeros((), jnp.float32)
                for _ in range(k_per):
                    _, vjp = jax.vjp(f, *args_)
                    g = vjp(ct_)[argnum]
                    s = s + chk(g)
                    ct_ = ct_ + EPS * s.astype(ct_.dtype)
                return acc + s

        fargs = (primal_args,) if mode == "fwd" else (primal_args, ct)
        dt = (timed(run, fargs) - floor) / k_per
        rate = f" ({flops/dt/1e12:5.1f} TF/s)" if flops else ""
        print(f"{name:44s} {mode:3s} {dt*1e3:6.2f} ms{rate}", flush=True)
        return dt

    def conv_f(stride, pad, lhs_dil=None):
        def f(x, w):
            return lax.conv_general_dilated(
                x, w, (stride, stride),
                pad if isinstance(pad, (list, tuple)) else
                [(pad, pad), (pad, pad)],
                lhs_dilation=lhs_dil, dimension_numbers=_DIMSPEC)
        return f

    def conv_flops(h_out, cin, cout, k, taps=None):
        return 2 * (taps if taps else k * k) * cin * cout * h_out * h_out * B

    # ======================================================================
    if want("ledger"):
        print(f"== production train-step rows, b{B}, bf16, "
              f"floor-corrected (v5e bf16 peak 197 TF/s) ==", flush=True)

        # blocked stem: 8×8/s2 3→256 @282² (282 = 276 + reflect-pad-6)
        x_stem = bf16(B, 282, 282, 3)
        k7 = bf16(7, 7, 3, 64, scale=0.01)
        w_stem = _strided_blocked_kernel(k7, 2)  # (8,8,3,256)
        f_stem = conv_f(2, [(0, 0), (0, 0)])
        fl_stem = conv_flops(138, 3, 256, 8)
        probe_fn("stem blocked 8×8/s2 3→256 @282²", f_stem, (x_stem, w_stem),
                 flops=fl_stem, mode="fwd")
        ct_stem = bf16(*jax.eval_shape(f_stem, x_stem, w_stem).shape)
        # dx to the image is DCE'd in training; dw is the live one
        probe_fn("stem blocked 8×8/s2 3→256 @282²", f_stem, (x_stem, w_stem),
                 ct_stem, flops=fl_stem, mode="dw")

        # blocked d0: 2×2 s1 (4·64)→128 @138², pad ((1,0),(1,0))
        x_d0 = bf16(B, 138, 138, 256)
        k3 = bf16(3, 3, 64, 128, scale=0.01)
        w_d0 = _blocked_down_kernel(k3)  # (2,2,256,128)
        f_d0 = conv_f(1, [(1, 0), (1, 0)])
        fl_d0 = conv_flops(138, 256, 128, 2)
        for mode in ("fwd", "dx", "dw"):
            ct = None if mode == "fwd" else bf16(B, 138, 138, 128)
            probe_fn("d0 blocked 2×2 256→128 @138²", f_d0, (x_d0, w_d0), ct,
                     flops=fl_d0, mode=mode)

        # head blocked: 10×10/s4 64→16 @282²
        x_head = bf16(B, 282, 282, 64)
        kh = bf16(7, 7, 64, 1, scale=0.01)
        w_head = _strided_blocked_kernel(kh, 4)  # (10,10,64,16)
        f_head = conv_f(4, [(0, 0), (0, 0)])
        fl_head = conv_flops(69, 64, 16, 10)
        for mode in ("fwd", "dx", "dw"):
            ct = None if mode == "fwd" else bf16(B, 69, 69, 16)
            probe_fn("head blocked 10×10/s4 64→16 @282²", f_head,
                     (x_head, w_head), ct, flops=fl_head, mode=mode)

        # D tower (256² 4-ch pair input; NLayer n=3, 4×4 convs)
        d_rows = [
            ("D c0 4×4/s2 4→64 @256²", 256, 4, 64, 2),
            ("D c1 4×4/s2 64→128 @128²", 128, 64, 128, 2),
            ("D c2 4×4/s2 128→256 @64²", 64, 128, 256, 2),
            ("D c3 4×4/s1 256→512 @32²", 32, 256, 512, 1),
            ("D head 4×4/s1 512→1 @31²", 31, 512, 1, 1),
        ]
        for name, h, cin, cout, stride in d_rows:
            x = bf16(B, h, h, cin)
            w = bf16(4, 4, cin, cout, scale=0.01)
            f = conv_f(stride, 1)
            hout_real = jax.eval_shape(f, x, w).shape[1]
            fl = conv_flops(hout_real, cin, cout, 4)
            for mode in ("fwd", "dx", "dw"):
                ct = None if mode == "fwd" else bf16(
                    *jax.eval_shape(f, x, w).shape)
                probe_fn(name, f, (x, w), ct, flops=fl, mode=mode)

        # big instance norms
        for name, h, c in (("IN @276²×64 (nu1)", 276, 64),
                           ("IN @138²×128 (nd0/nu0)", 138, 128),
                           ("IN blocked @138²×256 (stem)", 138, 256)):
            x = bf16(B, h, h, c)
            ct = bf16(B, h, h, c)
            f = instance_norm_blocked if "blocked" in name else instance_norm
            probe_fn(name, lambda x: f(x), (x,), mode="fwd")
            probe_fn(name, lambda x: f(x), (x,), ct, mode="dx")

    # ======================================================================
    if want("pad"):
        print("== reflect-pad rows & reformulations ==", flush=True)

        def pad_concat(x, p):
            x = jnp.concatenate(
                [jnp.flip(x[:, 1:p + 1], 1), x,
                 jnp.flip(x[:, -p - 1:-1], 1)], axis=1)
            return jnp.concatenate(
                [jnp.flip(x[:, :, 1:p + 1], 2), x,
                 jnp.flip(x[:, :, -p - 1:-1], 2)], axis=2)

        def pad_adjoint(ct, p):
            """Hand adjoint of reflect-pad: centre slice + 4 band adds
            (verified exact vs jax.vjp of jnp.pad on CPU)."""
            H, W = ct.shape[1] - 2 * p, ct.shape[2] - 2 * p
            g = ct[:, :, p:p + W]
            g = g.at[:, :, 1:p + 1].add(jnp.flip(ct[:, :, :p], 2))
            g = g.at[:, :, W - p - 1:W - 1].add(jnp.flip(ct[:, :, -p:], 2))
            h = g[:, p:p + H]
            h = h.at[:, 1:p + 1].add(jnp.flip(g[:, :p], 1))
            h = h.at[:, H - p - 1:H - 1].add(jnp.flip(g[:, -p:], 1))
            return h

        for name, h, c, p in (
            ("reflect-pad-3 @276²×64 (head)", 276, 64, 3),
            ("reflect-pad-1 @69²×256 (trunk)", 69, 256, 1),
            ("reflect-pad-3 @276²×3 (stem)", 276, 3, 3),
        ):
            x = bf16(B, h, h, c)
            ct = bf16(B, h + 2 * p, h + 2 * p, c)
            probe_fn(name, lambda x, p=p: reflect_pad2d(x, p), (x,),
                     mode="fwd")
            probe_fn(name, lambda x, p=p: reflect_pad2d(x, p), (x,), ct,
                     mode="dx")
            probe_fn(name + " concat-fwd", lambda x, p=p: pad_concat(x, p),
                     (x,), mode="fwd")
            probe_fn(name + " hand-adjoint", lambda c_, p=p: pad_adjoint(c_, p),
                     (ct,), mode="fwd")
            probe_fn(name + " ZERO-pad ref", lambda x, p=p: jnp.pad(
                x, ((0, 0), (p, p), (p, p), (0, 0))), (x,), mode="fwd")

    # ======================================================================
    # u1-backward reformulations (the measured pathology)
    # ======================================================================
    if not want("u1"):
        return
    print("== u1 backward reformulations (dx ≡ 3×3/s2 64→128 @276²+pad1; "
          "dw ≡ (3,3,128,64) contraction) ==", flush=True)

    ct_u1 = bf16(B, 276, 276, 64)   # cotangent of u1's output
    z_u1 = bf16(B, 138, 138, 128)   # u1's input
    w_u1 = bf16(3, 3, 128, 64, scale=0.01)  # HWIO as conv_transpose stores it

    fl_dx = conv_flops(138, 64, 128, 3)
    fl_dw = fl_dx  # same contraction size

    # (a) direct: XLA's own derivative of the lhs-dilated conv
    def u1_fwd(z, w):
        flipped = jnp.flip(w, axis=(0, 1))
        return lax.conv_general_dilated(
            z, flipped, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
            dimension_numbers=_DIMSPEC)

    probe_fn("u1 fwd convT 128→64 @138²", u1_fwd, (z_u1, w_u1),
             flops=fl_dx, mode="fwd")
    probe_fn("u1 dx (a) XLA-derived", u1_fwd, (z_u1, w_u1), ct_u1,
             flops=fl_dx, mode="dx")
    probe_fn("u1 dw (a) XLA-derived", u1_fwd, (z_u1, w_u1), ct_u1,
             flops=fl_dw, mode="dw")

    # The adjoint conv both reformulations target: dz = conv3×3/s2(ct, w̃)
    # with w̃[dy,dx,co,ci] = w[dy,dx,ci,co] (no spatial flip: the flip in
    # u1_fwd and the transpose-derivative flip cancel), padding 1 so
    # dz[i] = Σ_u ct[2i+u−1]·w[u].
    w_adj = jnp.transpose(w_u1, (0, 1, 3, 2))  # (3,3,64,128)

    def u1_dx_direct(ct, w):
        return lax.conv_general_dilated(
            ct, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=_DIMSPEC)

    probe_fn("u1 dx (a') hand stride-2 conv", u1_dx_direct, (ct_u1, w_adj),
             flops=fl_dx, mode="fwd")

    # (b) 4-parity decomposition: group taps u by parity; each group is a
    # stride-1 valid conv over a parity slice of the padded cotangent.
    def u1_dx_parity(ct, w):
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for qy in range(2):
            for qx in range(2):
                sub = ctp[:, qy::2, qx::2, :]
                ksub = w[qy::2, qx::2]
                y = lax.conv_general_dilated(
                    sub, ksub, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=_DIMSPEC)
                y = y[:, :138, :138]
                out = y if out is None else out + y
        return out

    # (c) im2col: 9 strided slices → 576-channel 1×1 conv (pure matmul)
    def u1_dx_im2col(ct, w):
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [ctp[:, dy:dy + 275:2, dx:dx + 275:2, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        wf = w.reshape(9 * 64, 128)
        return lax.dot_general(
            cols, wf, (((3,), (0,)), ((), ())))

    # verify the reformulations agree before timing them (bf16 inputs:
    # different-but-valid reassociations differ at ~1e-2 relative)
    ref = np.asarray(u1_dx_direct(ct_u1, w_adj), np.float32)
    for nm, fn in (("parity", u1_dx_parity), ("im2col", u1_dx_im2col)):
        got = np.asarray(fn(ct_u1, w_adj), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        assert got.shape == ref.shape and err < 3e-2, (nm, got.shape, err)
    print("   (parity & im2col forms verified ≡ direct)", flush=True)

    probe_fn("u1 dx (b) 4-parity convs", u1_dx_parity, (ct_u1, w_adj),
             flops=fl_dx, mode="fwd")
    probe_fn("u1 dx (c) im2col matmul", u1_dx_im2col, (ct_u1, w_adj),
             flops=fl_dx, mode="fwd")

    # (c for dw): dw[τ,ci,co] = Σ_{b,i} ctp[b,2i+τ,co]·z[b,i,ci]
    def u1_dw_im2col(ct, z):
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.stack(
            [ctp[:, dy:dy + 275:2, dx:dx + 275:2, :]
             for dy in range(3) for dx in range(3)])  # (9,B,138,138,64)
        dw = lax.dot_general(
            cols, z, (((1, 2, 3), (0, 1, 2)), ((), ())))  # (9,co,ci)
        return jnp.transpose(dw.reshape(3, 3, 64, 128), (0, 1, 3, 2))

    _, vjp = jax.vjp(u1_fwd, z_u1, w_u1)
    dw_ref = np.asarray(vjp(ct_u1)[1], np.float32)
    dw_got = np.asarray(u1_dw_im2col(ct_u1, z_u1), np.float32)
    err = np.max(np.abs(dw_got - dw_ref)) / (np.max(np.abs(dw_ref)) + 1e-9)
    assert dw_got.shape == dw_ref.shape and err < 3e-2, (dw_got.shape, err)
    print("   (im2col dw verified ≡ XLA-derived)", flush=True)

    probe_fn("u1 dw (c) im2col dot_general", u1_dw_im2col, (ct_u1, z_u1),
             flops=fl_dw, mode="fwd")

    # (b for dw): per-parity dot_generals without materialising the
    # (9,B,138,138,64) stack — each tap is one slice ⊗ z contraction.
    def u1_dw_taps(ct, z):
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dws = [
            lax.dot_general(
                ctp[:, dy:dy + 275:2, dx:dx + 275:2, :], z,
                (((0, 1, 2), (0, 1, 2)), ((), ())))  # (co, ci)
            for dy in range(3) for dx in range(3)
        ]
        dw = jnp.stack(dws).reshape(3, 3, 64, 128)
        return jnp.transpose(dw, (0, 1, 3, 2))

    dw_got = np.asarray(u1_dw_taps(ct_u1, z_u1), np.float32)
    err = np.max(np.abs(dw_got - dw_ref)) / (np.max(np.abs(dw_ref)) + 1e-9)
    assert dw_got.shape == dw_ref.shape and err < 3e-2, (dw_got.shape, err)
    probe_fn("u1 dw (b) 9 tap dot_generals", u1_dw_taps, (ct_u1, z_u1),
             flops=fl_dw, mode="fwd")

    # (d) W-PAIRED forms: (B,H,W,C) → (B,H,W/2,2C) is a FREE reshape on
    # row-major NHWC (the pallas_head insight), so the stride-2 W axis
    # becomes stride-1 over W-pairs with a repacked kernel — no sublane
    # gathers anywhere.  1.33× MAC overhead (8 padded taps vs 6), full
    # 128-lane contraction.  Verified exact on CPU.
    def u1_dx_wpair(ct, w):
        B_, H, W, C = ct.shape
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ctp_pair = ctp.reshape(B_, H + 2, (W + 2) // 2, 2 * C)
        k0 = jnp.concatenate([w[:, 0], w[:, 1]], axis=1)
        k1 = jnp.concatenate([w[:, 2], jnp.zeros_like(w[:, 2])], axis=1)
        K = jnp.stack([k0, k1], axis=1)  # (3,2,2C,Cout)
        return lax.conv_general_dilated(
            ctp_pair, K, (2, 1), [(0, 0), (0, 0)],
            dimension_numbers=_DIMSPEC)

    def u1_dx_wpair_hsplit(ct, w):
        B_, H, W, C = ct.shape
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ctp_pair = ctp.reshape(B_, H + 2, (W + 2) // 2, 2 * C)
        k0 = jnp.concatenate([w[:, 0], w[:, 1]], axis=1)
        k1 = jnp.concatenate([w[:, 2], jnp.zeros_like(w[:, 2])], axis=1)
        K = jnp.stack([k0, k1], axis=1)
        out = None
        for uy in range(3):
            sub = ctp_pair[:, uy::2][:, :138]
            y = lax.conv_general_dilated(
                sub, K[uy:uy + 1], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=_DIMSPEC)
            out = y if out is None else out + y
        return out

    def u1_dw_wpair(ct, z):
        B_, H, W, C = ct.shape
        ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ctp_pair = ctp.reshape(B_, H + 2, (W + 2) // 2, 2 * C)
        dws = []
        for uy in range(3):
            rows = ctp_pair[:, uy::2][:, :138]  # (B,138,139,2C)
            for ux in range(3):
                bx, px = divmod(ux, 2)
                sl = rows[:, :, bx:bx + 138, px * C:(px + 1) * C]
                dws.append(lax.dot_general(
                    sl, z, (((0, 1, 2), (0, 1, 2)), ((), ()))))  # (co,ci)
        dw = jnp.stack(dws).reshape(3, 3, 64, 128)
        return jnp.transpose(dw, (0, 1, 3, 2))

    for nm, fn in (("dx (d) W-paired conv", u1_dx_wpair),
                   ("dx (d2) W-paired H-split", u1_dx_wpair_hsplit)):
        got = np.asarray(fn(ct_u1, w_adj), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        assert got.shape == ref.shape and err < 3e-2, (nm, got.shape, err)
    dw_got = np.asarray(u1_dw_wpair(ct_u1, z_u1), np.float32)
    err = np.max(np.abs(dw_got - dw_ref)) / (np.max(np.abs(dw_ref)) + 1e-9)
    assert dw_got.shape == dw_ref.shape and err < 3e-2, (dw_got.shape, err)
    print("   (W-paired forms verified ≡ direct)", flush=True)

    probe_fn("u1 dx (d) W-paired conv", u1_dx_wpair, (ct_u1, w_adj),
             flops=fl_dx, mode="fwd")
    probe_fn("u1 dx (d2) W-paired H-split", u1_dx_wpair_hsplit,
             (ct_u1, w_adj), flops=fl_dx, mode="fwd")
    probe_fn("u1 dw (d) W-paired tap dots", u1_dw_wpair, (ct_u1, z_u1),
             flops=fl_dw, mode="fwd")


if __name__ == "__main__":
    main()
