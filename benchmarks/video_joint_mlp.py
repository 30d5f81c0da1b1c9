"""Joint-video int8 MLP experiment: can the F-split fused MLP kernel beat
the XLA int8 path at the joint tower's long sequence (s = 1 + T*196 = 785,
ViT-B/16 geometry)?

The s-aware fused gate (ops/quant.py::_use_fused_q) routes the whole joint
tower to XLA int8 because the ATTENTION kernel cannot fit s=785 in VMEM at
any chain width.  The MLP kernel, however, tiles F with f32 scratch
accumulation — at fb<=1024 its live set fits — so a HYBRID joint path
(XLA int8 attention + fused F-split MLP) is plausible.  This harness
measures whether it's worth wiring.

Relay-safe recipe: params as jit arguments, two alternating buffers,
small-slice D2H fence.

Usage: python benchmarks/video_joint_mlp.py [batch] [layers]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S, D, F, HEADS = 785, 768, 3072, 12


def timeit(fn, bufs, rest, steps=10):
    import jax

    np.asarray(jax.tree.leaves(fn(bufs[0], *rest))[0][:1])
    np.asarray(jax.tree.leaves(fn(bufs[1], *rest))[0][:1])
    t0 = time.perf_counter()
    out = None
    for i in range(steps):
        out = fn(bufs[i % 2], *rest)
    np.asarray(jax.tree.leaves(out)[0][:1])
    return (time.perf_counter() - t0) / steps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import jax
    import jax.numpy as jnp

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from debias_vision_lang_tpu.ops.fused_block_q import mlp_block_q
    from debias_vision_lang_tpu.ops.quant import int8_matmul, quantize_weight

    rng = np.random.default_rng(0)

    def qw(shape):
        w = rng.normal(size=shape).astype(np.float32) * 0.02
        return jax.device_put(quantize_weight(jnp.asarray(w)))

    def stack(make, n):
        trees = [make() for _ in range(n)]
        return jax.tree.map(lambda *a: jnp.stack(a), *trees)

    def layer():
        return {
            "ln_1": {"scale": jnp.ones((D,), jnp.float32),
                     "bias": jnp.zeros((D,), jnp.float32)},
            "ln_2": {"scale": jnp.ones((D,), jnp.float32),
                     "bias": jnp.zeros((D,), jnp.float32)},
            "attn": {"wqkv": qw((D, 3 * D)),
                     "bqkv": jnp.zeros((3 * D,), jnp.float32),
                     "wo": qw((D, D)),
                     "bo": jnp.zeros((D,), jnp.float32)},
            "mlp": {"w1": qw((D, F)), "b1": jnp.zeros((F,), jnp.float32),
                    "w2": qw((F, D)), "b2": jnp.zeros((D,), jnp.float32)},
        }

    lp = jax.device_put(stack(layer, layers))
    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(batch, S, D)).astype(np.float32)).astype(jnp.bfloat16))
        for _ in range(2)]

    import functools

    from debias_vision_lang_tpu.models.layers import layer_norm

    gelu = functools.partial(jax.nn.gelu, approximate=False)

    def xla_mlp_tower(x, p):
        def body(c, q):
            h = layer_norm(q["ln_2"], c)
            h = gelu(int8_matmul(h, q["mlp"]["w1"], q["mlp"]["b1"]))
            return c + int8_matmul(h, q["mlp"]["w2"], q["mlp"]["b2"]), None
        out, _ = jax.lax.scan(body, x, p)
        return out

    def fused_mlp_tower(fb, bb):
        def call(x, p):
            def body(c, q):
                m = q["mlp"]
                return mlp_block_q(
                    c, q["ln_2"]["scale"], q["ln_2"]["bias"],
                    m["w1"]["q"], m["w1"]["scale"], m["b1"],
                    m["w2"]["q"], m["w2"]["scale"], m["b2"],
                    act_kind="gelu", bb=bb, fb=fb), None
            out, _ = jax.lax.scan(body, x, p)
            return out
        return call

    from debias_vision_lang_tpu.ops.quant import attn_residual_q

    def hybrid_tower(fb):
        # the production hybrid body (quant.py::transformer_q): XLA int8
        # attention + fused F-split MLP in ONE scan — reproduces the
        # in-situ layout/pressure the MLP-only towers above don't see
        def call(x, p):
            def body(c, q):
                c = attn_residual_q(q["attn"], q["ln_1"], c, HEADS)
                m = q["mlp"]
                return mlp_block_q(
                    c, q["ln_2"]["scale"], q["ln_2"]["bias"],
                    m["w1"]["q"], m["w1"]["scale"], m["b1"],
                    m["w2"]["q"], m["w2"]["scale"], m["b2"],
                    act_kind="gelu", bb=1, fb=fb), None
            out, _ = jax.lax.scan(body, x, p)
            return out
        return call

    def xla_tower(x, p):
        def body(c, q):
            c = attn_residual_q(q["attn"], q["ln_1"], c, HEADS)
            h = layer_norm(q["ln_2"], c)
            h = gelu(int8_matmul(h, q["mlp"]["w1"], q["mlp"]["b1"]))
            return c + int8_matmul(h, q["mlp"]["w2"], q["mlp"]["b2"]), None
        out, _ = jax.lax.scan(body, x, p)
        return out

    print(f"backend={jax.default_backend()} s={S} d={D} f={F} "
          f"batch={batch} layers={layers}")
    base = None
    variants = [("mlp xla int8", jax.jit(xla_mlp_tower))] + [
        (f"mlp fused fb={fb} bb={bb}", jax.jit(fused_mlp_tower(fb, bb)))
        for fb in (1024, 512, 1536) for bb in (1, 2)]
    variants += [("tower xla int8", jax.jit(xla_tower))] + [
        (f"tower hybrid fb={fb}", jax.jit(hybrid_tower(fb)))
        for fb in (1536, 1024, 512)]
    for name, fn in variants:
        try:
            dt = timeit(fn, xs, (lp,))
        except Exception as e:
            print(f"{name:22s}: FAILED ({type(e).__name__}: {str(e)[:70]})")
            continue
        ips = batch / dt
        note = ""
        if base is None:
            base = dt
        else:
            note = f"  ({base / dt:.2f}x vs first)"
        print(f"{name:22s}: {dt * 1e3:7.1f} ms  {ips:8.1f} items/s{note}")


if __name__ == "__main__":
    main()
