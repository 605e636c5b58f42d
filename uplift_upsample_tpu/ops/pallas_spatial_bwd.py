"""Hand-written Pallas backward for the fused spatial-transformer stack.

The training hot path. The custom-VJP forward (`pallas_spatial.fused_spatial_train`)
runs the fused Pallas kernel; this module provides the matching backward as a
second Pallas kernel, replacing the rematerializing XLA VJP that made
TRAIN_FUSED_SPATIAL a ~1% win (PERF_NOTES.md round 1).

Design:
  - Same layout as the forward: activations (P=17, C, bt) with B·N frames on
    the 128-lane axis, everything VMEM-resident per tile.
  - In-kernel recomputation: the forward is re-run per tile, checkpointing
    only each block's input (5 × 278 KB); per-head attention weights are
    recomputed inside the backward head loop. No activation tensor ever
    touches HBM between the input read and the gradient writes.
  - Parameter gradients are written as per-tile partials with a leading grid
    axis and summed by XLA afterwards (18 MB of partials at B=2048 — noise),
    which keeps the grid parallel instead of forcing sequential accumulation.

Gradient math follows the reference semantics exactly (pre-norm blocks,
separate q/k/v, stochastic depth as per-frame scales: reference
vision_transformer.py:16-195); verified against `jax.vjp` of the XLA
reference in tests/test_fused_spatial_train.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spatial import HIGH3, _erf

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _make_dots(precision):
    """Forward-style and gradient dots for the (rows, lanes) layout.

    fwd_dot:  (C_out, C_in) @ (C_in, bt)  -> (C_out, bt)
    grad_dot: (A, bt) x (B, bt) contracted over lanes -> (A, B)
    """
    if precision == HIGH3:
        def fwd_dot(w, x):
            w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
            w_lo = w - w_hi
            x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            x_lo = x - x_hi
            dims = (((1,), (0,)), ((), ()))
            y = jax.lax.dot_general(w_hi, x_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_hi, x_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(w_lo, x_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            return y

        def grad_dot(a, b):
            a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
            a_lo = a - a_hi
            b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
            b_lo = b - b_hi
            dims = (((1,), (1,)), ((), ()))
            y = jax.lax.dot_general(a_hi, b_hi, dims,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(a_hi, b_lo, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            y += jax.lax.dot_general(a_lo, b_hi, dims,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            return y
        return fwd_dot, grad_dot

    def fwd_dot(w, x):
        return jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    def grad_dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
    return fwd_dot, grad_dot


def _ln_stats(x, eps):
    # x: (P, C, bt); stats over C (axis 1)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat, inv


def _ln_bwd(dy, xhat, inv, gamma):
    """Input grad of y = xhat*gamma + beta, norm over axis 1 (C)."""
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * inv


def _make_bwd_kernel(num_blocks: int, p_tokens: int, c: int, hidden: int,
                     num_heads: int, mlp_gelu: bool, precision,
                     attn: str = "fma"):
    depth = c // num_heads
    scale = np.float32(1.0 / float(depth) ** 0.5)
    fwd_dot, grad_dot = _make_dots(precision)

    def per_joint(fn, x, w, bias=None):
        rows = []
        for p in range(p_tokens):
            y = fn(w, x[p])
            rows.append(y if bias is None else y + bias)
        return jnp.stack(rows, axis=0)

    def dense_fwd(x, w_t, bias):  # (P, C_in, bt) -> (P, C_out, bt)
        return per_joint(fwd_dot, x, w_t, bias)

    def dense_dx(dy, kernel):  # dy: (P, C_out, bt), kernel (C_in, C_out)
        return per_joint(fwd_dot, dy, kernel)

    def dense_dw(x, dy):  # -> (C_in, C_out) summed over joints
        acc = None
        for p in range(p_tokens):
            piece = grad_dot(x[p], dy[p])
            acc = piece if acc is None else acc + piece
        return acc

    def bias_grad(dy):  # (P, C_out, bt) -> (1, C_out)
        return jnp.sum(dy, axis=(0, 2))[None, :]

    def attention_fwd(q, k, v):
        """Returns ctx (P, C, bt); per-head weights recomputed in backward."""
        ctx_heads = []
        for h in range(num_heads):
            sl = slice(h * depth, (h + 1) * depth)
            logits = None
            for d in range(depth):
                e = h * depth + d
                contrib = q[:, e, :][:, None, :] * k[:, e, :][None, :, :]
                logits = contrib if logits is None else logits + contrib
            logits = logits * scale
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (P, P, bt)
            ctx_h = None
            for kk in range(p_tokens):
                piece = attn[:, kk, :][:, None, :] * v[kk, sl, :][None, :, :]
                ctx_h = piece if ctx_h is None else ctx_h + piece
            ctx_heads.append(ctx_h)
        return jnp.concatenate(ctx_heads, axis=1)

    def _pack(x):
        """(P, C, bt) → (P, depth, H·bt): heads onto the lane axis.

        Mosaic requires concat inputs at sublane offset 0; head slice h
        starts at sublane (h·depth) mod 8, so slice from a pre-rolled copy
        per distinct offset (see pallas_spatial.attention_hpack.pack)."""
        rolled = {0: x}
        pieces = []
        for h in range(num_heads):
            off = (h * depth) % 8
            if off not in rolled:
                rolled[off] = pltpu.roll(x, x.shape[1] - off, axis=1)
            base = rolled[off]
            lo = h * depth - off
            pieces.append(base[:, lo:lo + depth, :])
        return jnp.concatenate(pieces, axis=-1)

    def _unpack(x):
        """(P, depth, H·bt) → (P, C, bt)."""
        bt = x.shape[-1] // num_heads
        return jnp.concatenate(
            [x[:, :, h * bt:(h + 1) * bt] for h in range(num_heads)], axis=1)

    def _attn_weights_hpack(qp, kp):
        logits = None
        for d in range(depth):
            contrib = qp[:, d, :][:, None, :] * kp[:, d, :][None, :, :]
            logits = contrib if logits is None else logits + contrib
        logits = logits * scale
        m = jnp.max(logits, axis=1, keepdims=True)
        ex = jnp.exp(logits - m)
        return ex / jnp.sum(ex, axis=1, keepdims=True)  # (P, P, H·bt)

    def attention_fwd_hpack(q, k, v):
        """Same math as attention_fwd with all heads' FMAs lane-packed
        (pallas_spatial.attention_hpack) — ~8x fewer vector-op issues."""
        qp, kp, vp = _pack(q), _pack(k), _pack(v)
        attn = _attn_weights_hpack(qp, kp)
        ctx = None
        for kk in range(p_tokens):
            piece = attn[:, kk, :][:, None, :] * vp[kk][None, :, :]
            ctx = piece if ctx is None else ctx + piece  # (P, depth, H·bt)
        return _unpack(ctx)

    def attention_bwd_hpack(q, k, v, dctx):
        """Head-packed-lanes version of attention_bwd (identical math)."""
        qp, kp, vp, dctxp = _pack(q), _pack(k), _pack(v), _pack(dctx)
        attn = _attn_weights_hpack(qp, kp)
        # dA[q, kk] = sum_d dctx[q, d] * v[kk, d]
        dattn = None
        for d in range(depth):
            contrib = dctxp[:, d, :][:, None, :] * vp[:, d, :][None, :, :]
            dattn = contrib if dattn is None else dattn + contrib
        # dv[kk, d] = sum_q attn[q, kk] * dctx[q, d]
        dv = None
        for qq in range(p_tokens):
            piece = attn[qq][:, None, :] * dctxp[qq][None, :, :]
            dv = piece if dv is None else dv + piece  # (P_k, depth, H·bt)
        s = jnp.sum(dattn * attn, axis=1, keepdims=True)
        dlogits = attn * (dattn - s) * scale  # (P_q, P_k, H·bt)
        dq = None
        for kk in range(p_tokens):
            piece = dlogits[:, kk, :][:, None, :] * kp[kk][None, :, :]
            dq = piece if dq is None else dq + piece
        dk = None
        for qq in range(p_tokens):
            piece = dlogits[qq][:, None, :] * qp[qq][None, :, :]
            dk = piece if dk is None else dk + piece
        return _unpack(dq), _unpack(dk), _unpack(dv)

    def attention_bwd(q, k, v, dctx):
        """Recompute per-head softmax; return dq, dk, dv (each (P, C, bt))."""
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(num_heads):
            sl = slice(h * depth, (h + 1) * depth)
            logits = None
            for d in range(depth):
                e = h * depth + d
                contrib = q[:, e, :][:, None, :] * k[:, e, :][None, :, :]
                logits = contrib if logits is None else logits + contrib
            logits = logits * scale
            m = jnp.max(logits, axis=1, keepdims=True)
            ex = jnp.exp(logits - m)
            attn = ex / jnp.sum(ex, axis=1, keepdims=True)  # (P_q, P_k, bt)

            dctx_h = dctx[:, sl, :]  # (P, depth, bt)
            # dA[q, kk] = sum_d dctx_h[q, d] * v[kk, hd+d]
            dattn = None
            for d in range(depth):
                e = h * depth + d
                contrib = dctx_h[:, d, :][:, None, :] * v[:, e, :][None, :, :]
                dattn = contrib if dattn is None else dattn + contrib
            # dv[kk, d] = sum_q attn[q, kk] * dctx_h[q, d]
            dv_h = None
            for qq in range(p_tokens):
                piece = attn[qq][:, None, :] * dctx_h[qq][None, :, :]
                dv_h = piece if dv_h is None else dv_h + piece  # (P_k, depth, bt)
            # softmax backward over the key axis (axis 1)
            s = jnp.sum(dattn * attn, axis=1, keepdims=True)
            dlogits = attn * (dattn - s) * scale  # (P_q, P_k, bt)
            # dq[q, d] = sum_kk dlogits[q, kk] * k[kk, hd+d]
            dq_h = None
            for kk in range(p_tokens):
                piece = dlogits[:, kk, :][:, None, :] * k[kk, sl, :][None, :, :]
                dq_h = piece if dq_h is None else dq_h + piece
            # dk[kk, d] = sum_q dlogits[q, kk] * q[q, hd+d]
            dk_h = None
            for qq in range(p_tokens):
                piece = dlogits[qq][:, None, :] * q[qq, sl, :][None, :, :]
                dk_h = piece if dk_h is None else dk_h + piece
            dq_heads.append(dq_h)
            dk_heads.append(dk_h)
            dv_heads.append(dv_h)
        return (jnp.concatenate(dq_heads, axis=1),
                jnp.concatenate(dk_heads, axis=1),
                jnp.concatenate(dv_heads, axis=1))

    if attn == "hpack":
        attention_fwd = attention_fwd_hpack  # noqa: F811
        attention_bwd = attention_bwd_hpack  # noqa: F811
    else:
        assert attn == "fma", attn

    def kernel(x_ref, g_ref, dp_ref,
               emb_w_ref, emb_b_ref, pe_ref,
               ln1_g_ref, ln1_b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wp_ref, bp_ref, ln2_g_ref, ln2_b_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, norm_g_ref, norm_b_ref,
               # outputs
               dx_ref, ddp_ref,
               demb_w_ref, demb_b_ref, dpe_ref,
               dln1_g_ref, dln1_b_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
               dwv_ref, dbv_ref, dwp_ref, dbp_ref, dln2_g_ref, dln2_b_ref,
               dw1_ref, db1_ref, dw2_ref, db2_ref, dnorm_g_ref, dnorm_b_ref):
        x_in = x_ref[:].astype(jnp.float32)  # (P, 2, bt)
        g = g_ref[:].astype(jnp.float32)     # (P, C, bt)
        dp = dp_ref[:].astype(jnp.float32)   # (2L, bt)

        # ---- forward replay, checkpointing each block's input -------------
        emb_w_t = emb_w_ref[:].T  # (C, 2)
        x = dense_fwd(x_in, emb_w_t, emb_b_ref[:].reshape(c, 1))
        x = x + pe_ref[:][:, :, None]
        ckpts = [x]
        for blk in range(num_blocks):
            g1 = ln1_g_ref[blk].reshape(c, 1)
            xhat1, _ = _ln_stats(x, 1e-5)
            y = xhat1 * g1 + ln1_b_ref[blk].reshape(c, 1)
            q = dense_fwd(y, wq_ref[blk].T, bq_ref[blk].reshape(c, 1))
            k = dense_fwd(y, wk_ref[blk].T, bk_ref[blk].reshape(c, 1))
            v = dense_fwd(y, wv_ref[blk].T, bv_ref[blk].reshape(c, 1))
            ctx = attention_fwd(q, k, v)
            proj = dense_fwd(ctx, wp_ref[blk].T, bp_ref[blk].reshape(c, 1))
            x = x + proj * dp[2 * blk][None, None, :]
            g2 = ln2_g_ref[blk].reshape(c, 1)
            xhat2, _ = _ln_stats(x, 1e-5)
            z = xhat2 * g2 + ln2_b_ref[blk].reshape(c, 1)
            h1 = dense_fwd(z, w1_ref[blk].T, b1_ref[blk].reshape(hidden, 1))
            if mlp_gelu:
                a = 0.5 * h1 * (1.0 + _erf(h1 * _INV_SQRT2))
            else:
                a = jnp.maximum(h1, 0.0)
            z2 = dense_fwd(a, w2_ref[blk].T, b2_ref[blk].reshape(c, 1))
            x = x + z2 * dp[2 * blk + 1][None, None, :]
            ckpts.append(x)

        # ---- final spatial_norm backward -----------------------------------
        xhat_n, inv_n = _ln_stats(ckpts[num_blocks], 1e-6)
        dnorm_g_ref[0] = jnp.sum(g * xhat_n, axis=(0, 2))[None, :]
        dnorm_b_ref[0] = bias_grad(g)
        d = _ln_bwd(g, xhat_n, inv_n, norm_g_ref[:].reshape(c, 1))

        # ---- block backward, reverse order ---------------------------------
        for blk in range(num_blocks - 1, -1, -1):
            x0 = ckpts[blk]
            s1 = dp[2 * blk][None, None, :]
            s2 = dp[2 * blk + 1][None, None, :]
            g1 = ln1_g_ref[blk].reshape(c, 1)
            g2 = ln2_g_ref[blk].reshape(c, 1)

            # recompute forward intermediates for this block
            xhat1, inv1 = _ln_stats(x0, 1e-5)
            y = xhat1 * g1 + ln1_b_ref[blk].reshape(c, 1)
            q = dense_fwd(y, wq_ref[blk].T, bq_ref[blk].reshape(c, 1))
            k = dense_fwd(y, wk_ref[blk].T, bk_ref[blk].reshape(c, 1))
            v = dense_fwd(y, wv_ref[blk].T, bv_ref[blk].reshape(c, 1))
            ctx = attention_fwd(q, k, v)
            proj = dense_fwd(ctx, wp_ref[blk].T, bp_ref[blk].reshape(c, 1))
            x2 = x0 + proj * s1
            xhat2, inv2 = _ln_stats(x2, 1e-5)
            z = xhat2 * g2 + ln2_b_ref[blk].reshape(c, 1)
            h1 = dense_fwd(z, w1_ref[blk].T, b1_ref[blk].reshape(hidden, 1))
            if mlp_gelu:
                phi = 0.5 * (1.0 + _erf(h1 * _INV_SQRT2))
                a = h1 * phi
            else:
                a = jnp.maximum(h1, 0.0)
            z2 = dense_fwd(a, w2_ref[blk].T, b2_ref[blk].reshape(c, 1))

            # MLP branch backward: x_next = x2 + s2 * z2
            dz2 = d * s2
            ddp_ref[2 * blk + 1] = jnp.sum(d * z2, axis=(0, 1))
            dw2_ref[0, blk] = dense_dw(a, dz2)
            db2_ref[0, blk] = jnp.sum(dz2, axis=(0, 2))
            da = dense_dx(dz2, w2_ref[blk])  # (P, hidden, bt)
            if mlp_gelu:
                dh1 = da * (phi + h1 * _INV_SQRT2PI
                            * jnp.exp(-0.5 * h1 * h1))
            else:
                dh1 = da * (h1 > 0.0).astype(jnp.float32)
            dw1_ref[0, blk] = dense_dw(z, dh1)
            db1_ref[0, blk] = jnp.sum(dh1, axis=(0, 2))
            dz = dense_dx(dh1, w1_ref[blk])  # (P, C, bt)

            dln2_g_ref[0, blk] = jnp.sum(dz * xhat2, axis=(0, 2))
            dln2_b_ref[0, blk] = jnp.sum(dz, axis=(0, 2))
            dx2 = d + _ln_bwd(dz, xhat2, inv2, g2)

            # attention branch backward: x2 = x0 + s1 * proj
            dproj = dx2 * s1
            ddp_ref[2 * blk] = jnp.sum(dx2 * proj, axis=(0, 1))
            dwp_ref[0, blk] = dense_dw(ctx, dproj)
            dbp_ref[0, blk] = jnp.sum(dproj, axis=(0, 2))
            dctx = dense_dx(dproj, wp_ref[blk])
            dq, dk, dv = attention_bwd(q, k, v, dctx)
            dwq_ref[0, blk] = dense_dw(y, dq)
            dbq_ref[0, blk] = jnp.sum(dq, axis=(0, 2))
            dwk_ref[0, blk] = dense_dw(y, dk)
            dbk_ref[0, blk] = jnp.sum(dk, axis=(0, 2))
            dwv_ref[0, blk] = dense_dw(y, dv)
            dbv_ref[0, blk] = jnp.sum(dv, axis=(0, 2))
            dy = (dense_dx(dq, wq_ref[blk]) + dense_dx(dk, wk_ref[blk])
                  + dense_dx(dv, wv_ref[blk]))

            dln1_g_ref[0, blk] = jnp.sum(dy * xhat1, axis=(0, 2))
            dln1_b_ref[0, blk] = jnp.sum(dy, axis=(0, 2))
            d = dx2 + _ln_bwd(dy, xhat1, inv1, g1)

        # ---- embedding + PE backward ---------------------------------------
        dpe_ref[0] = jnp.sum(d, axis=2)
        demb_w_ref[0] = dense_dw(x_in, d)  # (2, C)
        demb_b_ref[0] = bias_grad(d)
        dx_ref[:] = dense_dx(d, emb_w_ref[:])  # (P, 2, bt)

    return kernel


_PARAM_ORDER = ["emb_w", "emb_b", "pe", "ln1_g", "ln1_b", "wq", "bq", "wk",
                "bk", "wv", "bv", "wp", "bp", "ln2_g", "ln2_b", "w1", "b1",
                "w2", "b2", "norm_g", "norm_b"]


@functools.partial(jax.jit, static_argnames=("num_blocks", "num_heads",
                                             "mlp_gelu", "block_f",
                                             "precision", "attn"))
def fused_spatial_stack_bwd(x_t: jax.Array, stacked: Dict,
                            droppath_scales: jax.Array, g: jax.Array, *,
                            num_blocks: int, num_heads: int,
                            mlp_gelu: bool = True, block_f: int = 128,
                            precision=jax.lax.Precision.HIGHEST,
                            attn: str = "fma"):
    """VJP of `fused_spatial_stack` w.r.t. (stacked, x_t, droppath_scales).

    x_t: (P, 2, F); droppath_scales: (2*num_blocks, F); g: (P, C, F) output
    cotangent. Returns (dstacked, dx_t, ddroppath_scales).
    """
    p_tokens, c_in, f = x_t.shape
    c = stacked["emb_w"].shape[1]
    hidden = stacked["w1"].shape[2]
    assert block_f % 128 == 0 and f % block_f == 0, (f, block_f)
    n_tiles = f // block_f
    two_l = 2 * num_blocks

    kernel = _make_bwd_kernel(num_blocks, p_tokens, c, hidden, num_heads,
                              mlp_gelu, precision, attn=attn)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((p_tokens, c_in, block_f), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_tokens, c, block_f), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((two_l, block_f), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [full(stacked[name].shape) for name in _PARAM_ORDER]
    args = [x_t, g.astype(jnp.float32), droppath_scales.astype(jnp.float32)]
    args += [jnp.asarray(stacked[name], jnp.float32) for name in _PARAM_ORDER]

    # Gradient outputs: dx/ddp tiled over the grid; param grads as per-tile
    # partials on a dedicated leading grid axis (block (1, …) whose trailing
    # two dims equal the array's — the Mosaic block-shape rule), summed
    # afterwards. Vector grads get a singleton dim so the trailing-2 rule
    # sees (1, c) == the array dims.
    grad_shapes = dict(
        emb_w=(2, c), emb_b=(1, c), pe=(p_tokens, c),
        ln1_g=(num_blocks, c), ln1_b=(num_blocks, c),
        wq=(num_blocks, c, c), bq=(num_blocks, c),
        wk=(num_blocks, c, c), bk=(num_blocks, c),
        wv=(num_blocks, c, c), bv=(num_blocks, c),
        wp=(num_blocks, c, c), bp=(num_blocks, c),
        ln2_g=(num_blocks, c), ln2_b=(num_blocks, c),
        w1=(num_blocks, c, hidden), b1=(num_blocks, hidden),
        w2=(num_blocks, hidden, c), b2=(num_blocks, c),
        norm_g=(1, c), norm_b=(1, c),
    )

    out_specs = [
        pl.BlockSpec((p_tokens, c_in, block_f), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((two_l, block_f), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((p_tokens, c_in, f), jnp.float32),
        jax.ShapeDtypeStruct((two_l, f), jnp.float32),
    ]
    for name in _PARAM_ORDER:
        shape = grad_shapes[name]
        nd = 1 + len(shape)
        out_specs.append(pl.BlockSpec(
            (1,) + shape, lambda i, nd_=nd: (i,) + (0,) * (nd_ - 1),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles,) + shape, jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # The replay+backward working set peaks ~17 MB with the default
        # 16 MB scoped-vmem budget; raise the cap (v5e VMEM accommodates it).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)

    dx_t, ddp = outs[0], outs[1]
    dstacked = {}
    for name, partial in zip(_PARAM_ORDER, outs[2:]):
        summed = jnp.sum(partial, axis=0)
        dstacked[name] = summed.reshape(jnp.shape(stacked[name]))
    return dstacked, dx_t, ddp
