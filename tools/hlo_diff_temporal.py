"""Machine-diff the 42 ms production temporal cell vs the 25 ms probe cell.

Round-4 mystery (see PERF_NOTES): `temporal4_v3_wpt4_nojitprepped` (the real
`fused_temporal_stack_v3.__wrapped__` with pre-prepped operands) measures
42.06 ms at B=2048, while `tv3realk_inprep/const` (the real `_make_kernel_v3`
kernel inside a line-identical hand-written wrapper) measures 25.1-25.3 ms.
Line-level reading found no delta. This tool settles it mechanically: lower
BOTH cells with IDENTICAL operands inside the identical `device_timer` scan
loop, then diff the StableHLO after normalizing away constant payloads.

If the normalized StableHLO is identical, the jitted programs are the same
and the timing gap must come from operand *values* (trained vs random) —
then the decisive follow-up is `profile_r2.py tv3realk_realvals`.

Lowering is local (no remote compile, no TPU execution), so this is safe to
run outside the TPU queue.
"""

import difflib
import hashlib
import re
import sys
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import uplift_upsample_tpu.ops.pallas_temporal_v3 as ptv3  # noqa: E402

C, S, WPT = 384, 72, 4
R = WPT * S
HIDDEN, HEADS, DEPTH = 768, 8, 48
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

rng = np.random.default_rng(2)


def mk(*shape, dt=jnp.float32):
    a = rng.normal(size=shape).astype(np.float32) * 0.05
    return jnp.asarray(a).astype(dt)


# One shared operand set, in the real _transposed_operands order/shapes/dtypes.
flat_ops = []
for _ in range(4):
    flat_ops += [mk(C, 1), mk(C, 1), mk(3 * C, C, dt=jnp.bfloat16),
                 mk(3 * C, 1), mk(C, C, dt=jnp.bfloat16), mk(C, 1),
                 mk(C, 1), mk(C, 1), mk(HIDDEN, C, dt=jnp.bfloat16),
                 mk(HIDDEN, 1), mk(C, HIDDEN, dt=jnp.bfloat16), mk(C, 1)]
t_in = jnp.asarray(rng.normal(size=(B, 71, C)).astype(np.float32) * 0.3)

# stacked only feeds `hidden = stacked["w1"].shape[2]` when prepped_ops is set
stacked_dummy = {"w1": np.zeros((4, C, HIDDEN), np.float32),
                 "wqkv": np.zeros((4, C, 3 * C), np.float32)}

impl = ptv3.fused_temporal_stack_v3.__wrapped__


def cell_a(t, *flat):
    """Production wrapper (the 42 ms cell, nojitprepped config)."""
    return impl(t, stacked_dummy, None, num_blocks=4, num_heads=8,
                first_masked_blocks=0, windows_per_tile=WPT,
                activation="relu", weights_dtype=jnp.bfloat16,
                precision=jax.lax.Precision.DEFAULT, attn_mode="full",
                token_pad_to=0, prepped_ops=flat)


def fullspec(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


blkdiag_np = np.full((R, R), -1e9, np.float32)
for w in range(WPT):
    blkdiag_np[w * S:(w + 1) * S, w * S:(w + 1) * S] = 0.0
pad_row_np = np.zeros((S,), np.float32)
pad_row_np[71:] = -1e9

kernel_b = ptv3._make_kernel_v3(4, WPT, S, C, HIDDEN, HEADS, 0, "relu",
                                jax.lax.Precision.DEFAULT, "full")


def cell_b(t, *flat):
    """tv3realk_const body (the 25 ms cell)."""
    bb = t.shape[0]
    xp = jnp.pad(t, ((0, 0), (0, S - 71), (0, 0)))
    n_tiles = (bb * S) // R
    x_t = xp.reshape(n_tiles, R, C).transpose(0, 2, 1)
    row_spec = pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bd = jnp.asarray(blkdiag_np)
    prt = jnp.asarray(np.tile(pad_row_np, WPT))[None, :]
    ones = jnp.ones((8, C), jnp.float32)
    keyrow = jnp.broadcast_to(prt, (n_tiles, 1, R))
    padrow_full = jnp.broadcast_to(prt, (n_tiles, 1, R))
    out = pl.pallas_call(
        kernel_b,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, C, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  fullspec(bd), row_spec, row_spec, fullspec(ones)]
        + [fullspec(o) for o in flat],
        out_specs=pl.BlockSpec((1, C, R), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, C, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x_t, bd, keyrow, padrow_full, ones, *flat)
    return out.transpose(0, 2, 1).reshape(bb, S, C)[:, :71]


def timed_loop(fn):
    """The exact device_timer scan structure at m=4."""

    def loop(*a):
        def body(carry, _):
            out = fn(a[0] + carry, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.ravel()[:1]) * 1e-20).astype(a[0].dtype), None

        carry, _ = jax.lax.scan(body, jnp.zeros([], a[0].dtype), None,
                                length=4)
        return carry

    return loop


def normalize(text):
    """Replace constant payloads / backend configs with hashes, strip names."""
    lines = []
    payloads = []

    def hash_repl(m):
        s = m.group(0)
        h = hashlib.sha256(s.encode()).hexdigest()[:12]
        payloads.append((h, len(s)))
        return f"<payload {h} len={len(s)}>"

    text = re.sub(r'"0x[0-9A-Fa-f]{64,}"', hash_repl, text)
    text = re.sub(r'dense<[^>]{64,}>', hash_repl, text)
    # Mosaic kernel payloads live in backend_config dicts / string attrs
    text = re.sub(r'"[A-Za-z0-9+/=\\{}:,._\- ]{512,}"', hash_repl, text)
    for ln in text.splitlines():
        ln = re.sub(r"loc\(.*?\)", "", ln)
        ln = re.sub(r'\s+', ' ', ln).strip()
        if ln:
            lines.append(ln)
    return lines, payloads


def lower(fn, tag):
    lowered = jax.jit(timed_loop(fn)).lower(t_in, *flat_ops)
    txt = lowered.as_text()
    with open(f"/tmp/hlo_{tag}.mlir", "w") as f:
        f.write(txt)
    print(f"[{tag}] stablehlo: {len(txt)} chars -> /tmp/hlo_{tag}.mlir")
    return txt


ta = lower(cell_a, "cellA_prod42")
tb = lower(cell_b, "cellB_probe25")

la, pa = normalize(ta)
lb, pb = normalize(tb)
print(f"cellA: {len(la)} normalized lines, payload hashes: {pa}")
print(f"cellB: {len(lb)} normalized lines, payload hashes: {pb}")

diff = list(difflib.unified_diff(la, lb, "cellA_prod42", "cellB_probe25",
                                 lineterm="", n=1))
print(f"=== normalized diff: {len(diff)} lines ===")
for ln in diff[:400]:
    print(ln)
if len(diff) > 400:
    print(f"... ({len(diff) - 400} more)")
if not diff:
    print("IDENTICAL modulo constants -> the timing gap is operand-VALUE "
          "dependent; run profile_r2.py tv3realk_realvals next.")
