"""Micro-bench of c2r / zx contraction orientations on the real chip.

The stage probe shows c2r at 46 ms and zx at 51 ms at 512^3 where the
roofline is ~9 / ~25 ms; suspicion is XLA dot_general dimension-order
transposes (out = (batch, lhs_free, rhs_free) forces a full-array copy
when the desired layout interleaves them).  Times each variant
fetch-bracketed like bench.py.

Variants (c2r: out[a,y,z,x] = sum_k C[y,k] D[a,k,z,x], a=4 fields):
  c2r_einsum   -- the current form: einsum yk,akzx->ayzx
  c2r_pernarr  -- per-a clean matmul yk,kzx->yzx + stack
  c2r_movek    -- moveaxis k last, (azx..k)@(k,y) matmul, moveaxis back
  c2r_klast    -- k-last INPUT layout (a,z,x,k) @ C^T -> (a,z,x,y): no
                  transposes anywhere (what a ky-minor pipeline would do)

zx (per-plane z then x transform of (B,Z,X), B=1028 plane batch):
  zx_inplace   -- current W1 form: einsum kj,bjx->bkx then x via last-axis
  zx_moveaxis  -- moveaxis z last, matmul, moveaxis back, then x
  zx_pallas    -- fused VMEM kernel: one grid step per plane, z-matmul +
                  x-matmul without touching HBM in between

Usage (detached on the TPU):
  setsid nohup python scripts/microbench_contract.py > runs/microbench.log 2>&1 &
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("MB_N", "512"))
H = N // 2 + 1
REPS = int(os.environ.get("MB_REPS", "6"))
PREC = jax.lax.Precision.HIGHEST

key = jax.random.PRNGKey(0)
D = jax.random.normal(key, (4, H, N, N), jnp.float32)  # 4 = narray*pm collapsed
Dk = jnp.moveaxis(D, 1, -1)  # k-last twin (a, z, x, k)
C = jax.random.normal(jax.random.PRNGKey(1), (N, H), jnp.float32)
B = 4 * H  # plane batch for zx
P = jax.random.normal(key, (B, N, N), jnp.float32)
W = jax.random.normal(jax.random.PRNGKey(2), (N, N), jnp.float32)


@jax.jit
def c2r_einsum(D, C):
    return jnp.einsum("yk,akzx->ayzx", C, D, precision=PREC)


@jax.jit
def c2r_pernarr(D, C):
    outs = [
        jnp.einsum("yk,kzx->yzx", C, D[a], precision=PREC)
        for a in range(D.shape[0])
    ]
    return jnp.stack(outs)


@jax.jit
def c2r_movek(D, C):
    m = jnp.moveaxis(D, 1, -1)  # (a, z, x, k)
    out = jnp.matmul(m, C.T, precision=PREC)  # (a, z, x, y)
    return jnp.moveaxis(out, -1, 1)


@jax.jit
def c2r_klast(Dk, C):
    return jnp.matmul(Dk, C.T, precision=PREC)  # (a, z, x, y)


@jax.jit
def zx_inplace(P, W):
    z = jnp.einsum("kj,bjx->bkx", W, P, precision=PREC)
    return jnp.matmul(z, W.T, precision=PREC)


@jax.jit
def zx_moveaxis(P, W):
    m = jnp.swapaxes(P, -1, -2)
    z = jnp.swapaxes(jnp.matmul(m, W.T, precision=PREC), -1, -2)
    return jnp.matmul(z, W.T, precision=PREC)


def _zx_kernel(p_ref, w_ref, o_ref):
    z = jnp.dot(w_ref[:], p_ref[0], precision=PREC,
                preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(z, w_ref[:].T, precision=PREC,
                       preferred_element_type=jnp.float32)


@jax.jit
def zx_pallas(P, W):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _zx_kernel,
        grid=(P.shape[0],),
        in_specs=[
            pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
    )(P, W)


def probe(x):
    leaf = jax.tree.leaves(x)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 4),)
    return np.asarray(leaf[idx])


def bracket(f, *args):
    probe(f(*args))
    t0 = time.perf_counter()
    probe(f(*args))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    probe(out)
    t_chain = time.perf_counter() - t0
    return max((t_chain - t_one) / (REPS - 1), 1e-9)


@partial(jax.jit, static_argnames=("prec",))
def zx_prec(P, W, prec):
    z = jnp.einsum("kj,bjx->bkx", W, P, precision=prec)
    return jnp.matmul(z, W.T, precision=prec)


@partial(jax.jit, static_argnames=("prec",))
def c2r_prec(D, C, prec):
    return jnp.einsum("yk,akzx->ayzx", C, D, precision=prec)


HI = jax.lax.Precision.HIGHEST
HIGH = jax.lax.Precision.HIGH
DEF = jax.lax.Precision.DEFAULT

res = {"n": N, "platform": jax.devices()[0].platform}
cases = [
    ("c2r_einsum", c2r_einsum, (D, C)),
    ("c2r_pernarr", c2r_pernarr, (D, C)),
    ("c2r_movek", c2r_movek, (D, C)),
    ("c2r_klast", c2r_klast, (Dk, C)),
    ("zx_inplace", zx_inplace, (P, W)),
    ("zx_moveaxis", zx_moveaxis, (P, W)),
    ("zx_pallas", zx_pallas, (P, W)),
    # precision ladder on the same contraction: is the matmul pass-bound?
    ("zx_high", partial(zx_prec, prec=HIGH), (P, W)),
    ("zx_default", partial(zx_prec, prec=DEF), (P, W)),
    ("c2r_high", partial(c2r_prec, prec=HIGH), (D, C)),
    ("c2r_default", partial(c2r_prec, prec=DEF), (D, C)),
]
only = os.environ.get("MB_ONLY", "")
for name, f, args in cases:
    if only and not any(s in name for s in only.split(",")):
        continue
    try:
        res[name + "_ms"] = round(bracket(f, *args) * 1e3, 2)
    except Exception as e:  # pragma: no cover - probe tool
        res[name + "_err"] = repr(e)[:120]
    print(json.dumps(res), flush=True)
