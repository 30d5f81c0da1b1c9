"""Attention fused-block kernel experiments (v5e, relay-safe timing).

Variants timed as a 12-layer scan at B=256, S=197, D=768, H=12, bf16:
  cur   : ops.fused_block.attention_block (production)
  opt   : scale*log2e folded into q, exp2, post-PV normalization
  hgrid : grid over (batch, heads), f32 proj accumulation in scratch
"""
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from debias_vision_lang_tpu.ops.fused_block import attention_block, _ln_f32, _row

B, S, D, H = 256, 197, 768, 12
HD = D // H
LOG2E = math.log2(math.e)


# ---------------------------------------------------------------- opt kernel
def _attn_opt_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                     wo_ref, bo_ref, o_ref, *, heads: int):
    # expects q columns of wqkv/bqkv PRE-SCALED by scale*log2e
    x = x_ref[:]
    bb, s, d = x.shape
    hd = d // heads
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0])
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:][0].astype(jnp.float32)).astype(x.dtype)

    outs = []
    for h in range(heads):
        q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd, 2 * d + (h + 1) * hd,
                                 axis=2)
        sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp2(sc - m)
        ssum = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(x.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * (1.0 / ssum)
        outs.append(o.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)
    proj = jax.lax.dot_general(attn, wo_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    proj = proj + bo_ref[:][0].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "bb"))
def attention_block_opt(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, *,
                        heads: int, bb: int = 1):
    b, s, d = x.shape
    dt = x.dtype
    kern = functools.partial(_attn_opt_kernel, heads=heads)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, _row(ln_scale), _row(ln_bias), wqkv.astype(dt), _row(bqkv),
      wo.astype(dt), _row(bo))


def prescale_qkv(wqkv, bqkv, d, heads):
    scale = (d // heads) ** -0.5 * LOG2E
    wq = wqkv[:, :d] * scale
    bq = bqkv[:d] * scale
    return (jnp.concatenate([wq, wqkv[:, d:]], axis=1),
            jnp.concatenate([bq, bqkv[d:]], axis=0))


# -------------------------------------------------------------- hgrid kernel
def _attn_hgrid_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wo_ref, bo_ref, o_ref, xn_ref, acc_ref, *,
                       heads: int):
    """grid = (B//bb, heads); per step: one head's q/k/v from per-head wqkv
    block [d, 3*hd], softmax, PV, partial proj via wo block [hd, d],
    accumulate f32."""
    j = pl.program_id(1)
    x = x_ref[:]
    bb, s, d = x.shape
    hd = wo_ref.shape[0]

    @pl.when(j == 0)
    def _():
        xn_ref[:] = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0])

    xn = xn_ref[:]
    qkv = jax.lax.dot_general(xn, wqkv_ref[0], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    q = jax.lax.slice_in_dim(qkv, 0, hd, axis=2)
    k = jax.lax.slice_in_dim(qkv, hd, 2 * hd, axis=2)
    v = jax.lax.slice_in_dim(qkv, 2 * hd, 3 * hd, axis=2)
    sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp2(sc - m)
    ssum = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(e.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = (o * (1.0 / ssum)).astype(x.dtype)
    part = jax.lax.dot_general(o, wo_ref[:], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = x.astype(jnp.float32) + bo_ref[:][0].astype(jnp.float32) + part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == heads - 1)
    def _emit():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "bb"))
def attention_block_hgrid(x, ln_scale, ln_bias, wqkv_h, bqkv_h, wo_h, bo, *,
                          heads: int, bb: int = 1):
    """wqkv_h: [heads, d, 3*hd] pre-scaled per-head blocks; bqkv_h: [heads, 3*hd];
    wo_h: [heads, hd, d]."""
    b, s, d = x.shape
    hd = d // heads
    dt = x.dtype
    kern = functools.partial(_attn_hgrid_kernel, heads=heads)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, d), dt),
        grid=(b // bb, heads),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 3 * hd), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * hd), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bb, s, d), x.dtype),
                        pltpu.VMEM((bb, s, d), jnp.float32)],
    )(x, _row(ln_scale), _row(ln_bias), wqkv_h, bqkv_h[:, None, :], wo_h, _row(bo))


# ---------------------------------------------------------------- harness
def make_params(rng):
    k = jax.random.split(rng, 6)
    p = {
        "lns": jax.random.normal(k[0], (D,), jnp.float32) * 0.02 + 1.0,
        "lnb": jax.random.normal(k[1], (D,), jnp.float32) * 0.02,
        "wqkv": jax.random.normal(k[2], (D, 3 * D), jnp.float32) * D ** -0.5,
        "bqkv": jax.random.normal(k[3], (3 * D,), jnp.float32) * 0.02,
        "wo": jax.random.normal(k[4], (D, D), jnp.float32) * D ** -0.5,
        "bo": jax.random.normal(k[5], (D,), jnp.float32) * 0.02,
    }
    return p


def time_tower(fn, p, x, steps=30, layers=12):
    @jax.jit
    def tower(p, x):
        def body(c, _):
            return fn(p, c), None
        out, _ = jax.lax.scan(body, x, None, length=layers)
        return out

    np.asarray(tower(p, x)[:1, :1])
    t0 = time.perf_counter()
    o = None
    for _ in range(steps):
        o = tower(p, x)
    np.asarray(o[:1, :1])
    dt = (time.perf_counter() - t0) / steps
    return dt * 1e3  # ms per 12-layer tower pass


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = jax.random.key(0)
    p = jax.device_put(make_params(rng))
    x = jax.device_put(jax.random.normal(jax.random.key(1), (B, S, D),
                                         jnp.bfloat16))

    results = {}

    if which in ("all", "cur"):
        for bb in (1, 2, 4):
            f = lambda p, c, bb=bb: attention_block(
                c, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                heads=H, bb=bb)
            results[f"cur_bb{bb}"] = time_tower(f, p, x)
            print(f"cur bb={bb}: {results[f'cur_bb{bb}']:.2f} ms/tower", flush=True)

    if which in ("all", "opt"):
        wq, bq = prescale_qkv(p["wqkv"], p["bqkv"], D, H)
        p2 = dict(p, wqkv_s=wq, bqkv_s=bq)
        for bb in (1, 2, 4):
            f = lambda p, c, bb=bb: attention_block_opt(
                c, p["lns"], p["lnb"], p["wqkv_s"], p["bqkv_s"], p["wo"],
                p["bo"], heads=H, bb=bb)
            results[f"opt_bb{bb}"] = time_tower(f, p2, x)
            print(f"opt bb={bb}: {results[f'opt_bb{bb}']:.2f} ms/tower", flush=True)
        # correctness vs current
        a = attention_block(x[:8], p["lns"], p["lnb"], p["wqkv"], p["bqkv"],
                            p["wo"], p["bo"], heads=H, bb=1)
        b = attention_block_opt(x[:8], p["lns"], p["lnb"], wq, bq, p["wo"],
                                p["bo"], heads=H, bb=1)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"opt max|diff| vs cur: {err:.5f}")

    if which in ("all", "hgrid"):
        wq, bq = prescale_qkv(p["wqkv"], p["bqkv"], D, H)
        # per-head blocks: [H, D, 3*HD], [H, 3*HD], [H, HD, D]
        wqkv_h = jnp.stack([
            jnp.concatenate([wq[:, h*HD:(h+1)*HD],
                             wq[:, D + h*HD:D + (h+1)*HD],
                             wq[:, 2*D + h*HD:2*D + (h+1)*HD]], axis=1)
            for h in range(H)]).astype(jnp.bfloat16)
        bqkv_h = jnp.stack([
            jnp.concatenate([bq[h*HD:(h+1)*HD], bq[D + h*HD:D + (h+1)*HD],
                             bq[2*D + h*HD:2*D + (h+1)*HD]])
            for h in range(H)])
        p3 = dict(p, wqkv_h=wqkv_h, bqkv_h=bqkv_h, wo_h=p["wo"])
        for bb in (1, 2, 4):
            f = lambda p, c, bb=bb: attention_block_hgrid(
                c, p["lns"], p["lnb"], p["wqkv_h"], p["bqkv_h"], p["wo_h"],
                p["bo"], heads=H, bb=bb)
            results[f"hgrid_bb{bb}"] = time_tower(f, p3, x)
            print(f"hgrid bb={bb}: {results[f'hgrid_bb{bb}']:.2f} ms/tower", flush=True)
        a = attention_block(x[:8], p["lns"], p["lnb"], p["wqkv"], p["bqkv"],
                            p["wo"], p["bo"], heads=H, bb=1)
        c = attention_block_hgrid(x[:8], p["lns"], p["lnb"], wqkv_h, bqkv_h,
                                  p["wo"], p["bo"], heads=H, bb=1)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32))))
        print(f"hgrid max|diff| vs cur: {err:.5f}")

    print({k: round(v, 2) for k, v in sorted(results.items())})


if __name__ == "__main__":
    main()
