"""Experiment: int8 per-head QK^T and PV dots inside the int8 attention block."""
import sys, time, functools
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from debias_vision_lang_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from debias_vision_lang_tpu.models.layers import init_resblocks
from debias_vision_lang_tpu.ops.quant import quantize_resblocks
from debias_vision_lang_tpu.ops.fused_block import _ln_f32, _row
from debias_vision_lang_tpu.ops.fused_block_q import (
    attention_block_q, _quant_rows, _dot_q, _wrow)

def _attn_qq_kernel(x_ref, lns_ref, lnb_ref, wqkvq_ref, sqkv_ref, bqkv_ref,
                    woq_ref, so_ref, bo_ref, o_ref, *, heads, scale):
    x = x_ref[:]
    bb, s, d = x.shape
    hd = d // heads
    xn = _ln_f32(x, lns_ref[:][0], lnb_ref[:][0]).astype(jnp.float32)
    xq, xs = _quant_rows(xn)
    qkv = _dot_q(xq, xs, wqkvq_ref, sqkv_ref)
    qkv = qkv + bqkv_ref[:][0].astype(jnp.float32)   # f32 [bb,s,3d]
    outs = []
    for h in range(heads):
        q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(qkv, d + h * hd, d + (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * d + h * hd, 2 * d + (h + 1) * hd, axis=2)
        # int8 QK^T: per-row quantization of q and k
        qq, qsc = _quant_rows(q)
        kq, ksc = _quant_rows(k)
        sc32 = jax.lax.dot_general(qq, kq, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
        sc = sc32.astype(jnp.float32) * qsc * jnp.swapaxes(ksc, 1, 2) * scale
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        # int8 PV: probs and v per-row quantized
        pq, psc = _quant_rows(p)
        vq, vsc = _quant_rows(jnp.swapaxes(v, 1, 2))  # quantize v columns? approximate: per-row of v^T
        o32 = jax.lax.dot_general(pq, jnp.swapaxes(vq, 1, 2), (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.int32)
        o = o32.astype(jnp.float32) * psc * jnp.swapaxes(vsc, 1, 2)
        outs.append(o.astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
    aq, ascale = _quant_rows(attn)
    proj = _dot_q(aq, ascale, woq_ref, so_ref)
    proj = proj + bo_ref[:][0].astype(jnp.float32)
    o_ref[:] = (x.astype(jnp.float32) + proj).astype(o_ref.dtype)

@functools.partial(jax.jit, static_argnames=("heads", "bb"))
def attention_block_qq(x, ln_scale, ln_bias, wqkv_q, wqkv_scale, bqkv,
                       wo_q, wo_scale, bo, *, heads, bb=1):
    b, s, d = x.shape
    kern = functools.partial(_attn_qq_kernel, heads=heads,
                             scale=1.0 / (d // heads) ** 0.5)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(x, _row(ln_scale), _row(ln_bias), wqkv_q, _wrow(wqkv_scale), _row(bqkv),
      wo_q, _wrow(wo_scale), _row(bo))

if __name__ == "__main__":
    B, S, D, H = 256, 197, 768, 12
    stacked = init_resblocks(jax.random.key(0), 1, D)
    qz = quantize_resblocks(stacked)
    l0 = jax.tree.map(lambda a: a[0], qz)
    a = l0["attn"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, S, D)) * 0.5, jnp.bfloat16)
    args = (x, l0["ln_1"]["scale"], l0["ln_1"]["bias"],
            a["wqkv"]["q"], a["wqkv"]["scale"], a["bqkv"],
            a["wo"]["q"], a["wo"]["scale"], a["bo"])
    ref = np.asarray(attention_block_q(*args, heads=H), np.float32)
    got = np.asarray(attention_block_qq(*args, heads=H), np.float32)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    print("cosine vs int8-weights block:", cos, " max|d|:", np.abs(ref - got).max())

    def t(f, iters=30):
        out = f(); float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters): out = f()
        float(jnp.sum(out.ravel()[:1].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3
    t_ref = t(lambda: attention_block_q(*args, heads=H))
    t_qq = t(lambda: attention_block_qq(*args, heads=H))
    print(f"int8-weights attn: {t_ref:6.2f} ms   int8-cores attn: {t_qq:6.2f} ms   speedup {t_ref/t_qq:.2f}x")
