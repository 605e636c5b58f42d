"""Per-site matmul-precision drift attribution — entirely on CPU.

TPU DEFAULT-precision f32 dots execute as one bf16 pass (operands rounded to
bf16, f32 accumulate); HIGH3 is the manual 3-pass bf16 hi/lo split. Both are
bit-simulable on CPU: round operands to bf16, contract in f32. This tool
reimplements the fused eval forward (models/bench_forward.py path) in plain
jnp with EVERY dot routed through a site-keyed precision map, so the drift of
any mixed-precision assignment can be measured against the f32 truth without
touching the TPU — the chip is only needed once, to confirm the chosen rung
(tools/check_tpu_parity.py) and time it.

Sites (matching the kernel structure; spatial attention is exact-f32 VPU in
the fused kernel, so its sim default is f32):

  sp_emb sp_qkv sp_attn sp_proj sp_mlp   spatial kernel dots
  s2t                                    spatial->temporal Dense
  tm_qkv tm_attn tm_proj tm_mlp          temporal kernel dots
  st_qkv st_attn st_proj st_mlp          strided block 1 (kernel epilogue)
  tail                                   strided blocks 2+, head2 (XLA)

Usage:
  python tools/sim_drift.py --mode validate   # sim vs model.apply f32
  python tools/sim_drift.py --mode ladder     # per-site attribution table
  python tools/sim_drift.py --mode greedy     # minimal-HIGH3-set search
  python tools/sim_drift.py --mode config --sites tm_qkv=bf16x3,...
"""

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

SITES = ["sp_emb", "sp_qkv", "sp_attn", "sp_proj", "sp_mlp", "s2t",
         "tm_qkv", "tm_attn", "tm_proj", "tm_mlp",
         "st_qkv", "st_attn", "st_proj", "st_mlp", "tail"]


def _bf16(a):
    return a.astype(jnp.bfloat16).astype(jnp.float32)


def make_sdot(prec_map):
    """site-keyed matmul: f32 accumulate, operands per the site's mode."""

    def sdot(a, b, site):
        mode = prec_map[site]
        if mode == "f32":
            return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        if mode == "bf16":
            return jnp.matmul(_bf16(a), _bf16(b),
                              precision=jax.lax.Precision.HIGHEST)
        if mode == "bf16x3":
            a_hi, b_hi = _bf16(a), _bf16(b)
            a_lo, b_lo = _bf16(a - a_hi), _bf16(b - b_hi)
            hst = jax.lax.Precision.HIGHEST
            return (jnp.matmul(a_hi, b_hi, precision=hst)
                    + jnp.matmul(a_hi, b_lo, precision=hst)
                    + jnp.matmul(a_lo, b_hi, precision=hst))
        if mode == "bf16x2w":
            # 2-pass candidate rung: weights (b operand) split hi/lo,
            # activations rounded ONCE — error is the activations' bf16
            # rounding alone (~1/sqrt(2) of 1-pass, NOT squared like x3).
            b_hi = _bf16(b)
            b_lo = _bf16(b - b_hi)
            a_r = _bf16(a)
            hst = jax.lax.Precision.HIGHEST
            return (jnp.matmul(a_r, b_hi, precision=hst)
                    + jnp.matmul(a_r, b_lo, precision=hst))
        if mode == "bf16x2a":
            # symmetric candidate: activations split, weights rounded once
            a_hi = _bf16(a)
            a_lo = _bf16(a - a_hi)
            b_r = _bf16(b)
            hst = jax.lax.Precision.HIGHEST
            return (jnp.matmul(a_hi, b_r, precision=hst)
                    + jnp.matmul(a_lo, b_r, precision=hst))
        raise ValueError(mode)

    return sdot


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * scale + bias


def _attention(sdot, y, blk, num_heads, site_qkv, site_attn, key_mask=None):
    """Pre-LN MHA on y (B, S, C) with separate wq/wk/wv (flax param layout)."""
    b, s, c = y.shape
    depth = c // num_heads
    a = blk["attn"]
    q = sdot(y, a["wq"]["kernel"], site_qkv) + a["wq"]["bias"]
    k = sdot(y, a["wk"]["kernel"], site_qkv) + a["wk"]["bias"]
    v = sdot(y, a["wv"]["kernel"], site_qkv) + a["wv"]["bias"]
    split = lambda t: t.reshape(b, s, num_heads, depth).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    logits = sdot(q, k.transpose(0, 1, 3, 2), site_attn) / np.sqrt(depth)
    if key_mask is not None:  # (B, S), 1 = blocked key
        logits = logits + key_mask[:, None, None, :] * -1e9
    w = jax.nn.softmax(logits, axis=-1)
    ctx = sdot(w, v, site_attn)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, c)


def sim_forward(params, x2d, stride_mask, prec_map, cfg):
    """Mirror of the fused eval path with per-site dot precision."""
    sdot = make_sdot(prec_map)
    b, n, p, _ = x2d.shape
    heads = cfg["num_heads"]

    # ---- spatial stack (frame-independent over joints) ---------------------
    x = x2d.reshape(b * n, p, 2)
    x = sdot(x, params["keypoint_embedding"]["kernel"], "sp_emb") \
        + params["keypoint_embedding"]["bias"]
    x = x + params["spatial_pe"]
    for i in range(cfg["spatial_depth"]):
        blk = params[f"spatial_block_{i + 1}"]
        y = _ln(x, blk["norm1"]["scale"], blk["norm1"]["bias"], 1e-5)
        ctx = _attention(sdot, y, blk, heads, "sp_qkv", "sp_attn")
        x = x + sdot(ctx, blk["attn"]["proj"]["kernel"], "sp_proj") \
            + blk["attn"]["proj"]["bias"]
        z = _ln(x, blk["norm2"]["scale"], blk["norm2"]["bias"], 1e-5)
        z = sdot(z, blk["mlp"]["fc1"]["kernel"], "sp_mlp") + blk["mlp"]["fc1"]["bias"]
        z = 0.5 * z * (1.0 + jax.lax.erf(z / np.sqrt(2.0)))
        z = sdot(z, blk["mlp"]["fc2"]["kernel"], "sp_mlp") + blk["mlp"]["fc2"]["bias"]
        x = x + z
    x = _ln(x, params["spatial_norm"]["scale"], params["spatial_norm"]["bias"], 1e-6)
    x = x.reshape(b, n, p * cfg["spatial_d"])

    # ---- s2t + token substitution + PE ------------------------------------
    x = sdot(x, params["spatial_to_temporal_fc"]["kernel"], "s2t") \
        + params["spatial_to_temporal_fc"]["bias"]
    sm = stride_mask.astype(jnp.float32)[..., None]
    x = sm * x + (1.0 - sm) * params["strided_input_token"][None, None, :]
    x = x + params["temporal_pe"]
    inv_mask = 1.0 - stride_mask.astype(jnp.float32)

    # ---- temporal stack ----------------------------------------------------
    for i in range(cfg["temporal_depth"]):
        blk = params[f"temporal_block_{i + 1}"]
        km = inv_mask if i < cfg["first_masked_blocks"] else None
        y = _ln(x, blk["norm1"]["scale"], blk["norm1"]["bias"], 1e-5)
        ctx = _attention(sdot, y, blk, heads, "tm_qkv", "tm_attn", key_mask=km)
        x = x + sdot(ctx, blk["attn"]["proj"]["kernel"], "tm_proj") \
            + blk["attn"]["proj"]["bias"]
        z = _ln(x, blk["norm2"]["scale"], blk["norm2"]["bias"], 1e-5)
        z = sdot(z, blk["mlp"]["fc1"]["kernel"], "tm_mlp") + blk["mlp"]["fc1"]["bias"]
        z = jnp.maximum(z, 0.0)
        z = sdot(z, blk["mlp"]["fc2"]["kernel"], "tm_mlp") + blk["mlp"]["fc2"]["bias"]
        x = x + z

    # ---- strided stack (block 1 = kernel epilogue; 2+ = XLA tail) ----------
    # This simulator targets the flagship geometry: stride>1 blocks with
    # padding (0,0) (k3 VALID conv + crop-both-ends residual). A stride-1
    # block would need the padded-conv variant — assert rather than drift.
    assert all(s > 1 for s in cfg["strides"]), cfg["strides"]
    for i, s in enumerate(cfg["strides"]):
        blk = params[f"strided_temporal_block_{i + 1}"]
        sq, sa, sp_, sm_ = (("st_qkv", "st_attn", "st_proj", "st_mlp") if i == 0
                            else ("tail", "tail", "tail", "tail"))
        x = x + params[f"strided_temporal_pe_{i + 1}"]
        y = _ln(x, blk["norm1"]["scale"], blk["norm1"]["bias"], 1e-5)
        ctx = _attention(sdot, y, blk, heads, sq, sa)
        x = x + sdot(ctx, blk["attn"]["proj"]["kernel"], sp_) \
            + blk["attn"]["proj"]["bias"]
        z = _ln(x, blk["norm2"]["scale"], blk["norm2"]["bias"], 1e-5)
        z = sdot(z, blk["mlp"]["fc1"]["kernel"], sm_) + blk["mlp"]["fc1"]["bias"]
        z = jnp.maximum(z, 0.0)
        # conv k3/stride s VALID with padding (0,0) as 3 shifted dots
        w = blk["mlp"]["fc2"]["kernel"]  # (3, hidden, C)
        n_in = z.shape[1]
        n_out = (n_in - 3) // s + 1
        zc = None
        for j in range(3):
            piece = sdot(z[:, j: j + (n_out - 1) * s + 1: s], w[j], sm_)
            zc = piece if zc is None else zc + piece
        zc = zc + blk["mlp"]["fc2"]["bias"]
        ident = x[:, 1:-1][:, ::s] if s > 1 else x
        x = ident + zc

    x = sdot(x, params["strided_temporal_fc"]["kernel"], "tail") \
        + params["strided_temporal_fc"]["bias"]
    return x.reshape(b, cfg["num_keypoints"], 3)


def setup(batch):
    from tools.check_tpu_parity import build_model_and_inputs
    model, variables, x, sm = build_model_and_inputs(batch)
    cfg = dict(num_heads=model.num_heads, spatial_depth=model.spatial_depth,
               temporal_depth=model.temporal_depth,
               first_masked_blocks=model.first_strided_token_attention_layer,
               strides=tuple(model.strides), spatial_d=model.spatial_d_model,
               num_keypoints=model.num_keypoints)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                          variables["params"])
    return model, variables, params, x, sm, cfg


def drift(central, truth):
    d = np.linalg.norm(np.asarray(central, np.float64) - truth, axis=-1)
    return float(d.mean() * 1e3), float(d.max() * 1e3)


def run(params, x, sm, cfg, assign):
    prec_map = {s: assign.get(s, "f32") for s in SITES}
    fwd = jax.jit(lambda p, a, m: sim_forward(p, a, m, prec_map, cfg))
    return np.asarray(fwd(params, x, sm))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--mode", default="ladder",
                    choices=["validate", "ladder", "greedy", "config"])
    ap.add_argument("--sites", default="",
                    help="config mode: comma list "
                         "site=f32|bf16|bf16x3|bf16x2w|bf16x2a; "
                         "'all=<mode>' sets every site")
    ap.add_argument("--target", type=float, default=0.5,
                    help="greedy mode: target mean drift (mm at fixture scale)")
    args = ap.parse_args()

    model, variables, params, x, sm, cfg = setup(args.batch)

    with jax.default_matmul_precision("highest"):
        _, truth = jax.jit(
            lambda v, a, m: model.apply(v, a, stride_mask=m, training=False)
        )(variables, x, sm)
    truth = np.asarray(truth, np.float64)

    if args.mode == "validate":
        got = run(params, x, sm, cfg, {})
        mean, mx = drift(got, truth)
        print(json.dumps({"sim_vs_model_mean_mm": mean, "max_mm": mx,
                          "out_std": float(np.std(truth))}))
        # f32 reduction-order noise floor (~0.005 mm at fixture scale, same
        # level as xla_highest-vs-CPU in PERF_NOTES) — far below the 0.5+ mm
        # signals this tool attributes.
        assert mean < 0.05, "simulator diverges from model.apply"
        return

    if args.mode == "config":
        assign = dict(kv.split("=") for kv in args.sites.split(",") if kv)
        if "all" in assign:
            mode_all = assign.pop("all")
            assign = {**{s: mode_all for s in SITES}, **assign}
        mean, mx = drift(run(params, x, sm, cfg, assign), truth)
        print(json.dumps({"sites": assign, "mean_mm": round(mean, 4),
                          "max_mm": round(mx, 4)}))
        return

    if args.mode == "ladder":
        # all-DEFAULT baseline, then each single site upgraded / isolated
        for label, assign in [
            ("all_bf16", {s: "bf16" for s in SITES}),
            ("all_bf16x3", {s: "bf16x3" for s in SITES}),
        ]:
            mean, mx = drift(run(params, x, sm, cfg, assign), truth)
            print(json.dumps({"config": label, "mean_mm": round(mean, 4),
                              "max_mm": round(mx, 4)}), flush=True)
        for site in SITES:
            # isolate: ONLY this site at bf16, rest exact → its own contribution
            solo = {s: ("bf16" if s == site else "f32") for s in SITES}
            m1, _ = drift(run(params, x, sm, cfg, solo), truth)
            # upgrade: this site bf16x3, rest bf16 → what fixing only it buys
            up = {s: ("bf16x3" if s == site else "bf16") for s in SITES}
            m2, _ = drift(run(params, x, sm, cfg, up), truth)
            print(json.dumps({"site": site, "solo_bf16_mean_mm": round(m1, 4),
                              "upgraded_alone_mean_mm": round(m2, 4)}),
                  flush=True)
        return

    # greedy: start all-bf16, repeatedly upgrade the site with the largest
    # drift reduction until mean <= target
    assign = {s: "bf16" for s in SITES}
    mean, _ = drift(run(params, x, sm, cfg, assign), truth)
    print(json.dumps({"start_mean_mm": round(mean, 4)}), flush=True)
    while mean > args.target:
        best_site, best_mean = None, mean
        for site in SITES:
            if assign[site] != "bf16":
                continue
            trial = dict(assign, **{site: "bf16x3"})
            m, _ = drift(run(params, x, sm, cfg, trial), truth)
            if m < best_mean:
                best_site, best_mean = site, m
        if best_site is None:
            print(json.dumps({"stuck_at_mean_mm": round(mean, 4)}))
            break
        assign[best_site] = "bf16x3"
        mean = best_mean
        print(json.dumps({"upgraded": best_site, "mean_mm": round(mean, 4)}),
              flush=True)
    print(json.dumps({"final": {k: v for k, v in assign.items()
                                if v != "bf16"},
                      "mean_mm": round(mean, 4)}))


if __name__ == "__main__":
    main()
