"""Direct device microbench of ops/gqa_decode.gqa_blocked_partials — no
model around it, so the kernel's cost is measured against its own stream
roofline. Hypothesis being tested (round 5): the (L, B, T, Hkv) fp32 scale
planes sit in (8, 128)-tiled HBM with 124/128 lanes of padding (Hkv = 4),
so "half the cache bytes" int8 streaming actually moves int8 payload PLUS
~32x-padded scale tiles — which would explain the kernel measuring ~2x its
int8 stream roofline while the bf16 XLA path sits at its own roofline.

    python scripts/microbench_gqa.py            # runs all three variants

Variants (one compile each; the 22-layer walk loops the SAME program over
the scalar-prefetched layer index, so XLA cannot CSE it away):
  int8        — int8 slab + fp32 (L, B, T, Hkv) scales (the real config)
  int8_nosc   — same int8 slab, scales ABSENT (kv_int8=False path; math is
                wrong, bandwidth is the point)
  bf16        — bf16 slab, no scales
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cleantransformer_tpu.ops.gqa_decode import gqa_blocked_partials

L, B, T, Hkv, hd, H = 22, 8, 8192, 4, 128, 32
Dkv = Hkv * hd
GIB = 1024 ** 3


def run_variant(tag, kq, ks, vq, vs):
    qt = jnp.asarray(np.random.RandomState(0).randn(B, H, Dkv) * 0.1,
                     jnp.bfloat16)
    bias = jnp.zeros((B, T, 1), jnp.float32)

    @jax.jit
    def step(qt):
        def body(i, acc):
            m, den, a = gqa_blocked_partials(qt, kq, ks, vq, vs, bias, i,
                                             kv_heads=Hkv, scale=0.0884)
            return acc + a[0, 0, 0]
        return jax.lax.fori_loop(0, L, body, jnp.zeros((), jnp.float32))

    float(step(qt))                                   # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(step(qt))
        times.append(time.perf_counter() - t0)
    # subtract one tunnel RTT (scalar fetch)
    t0 = time.perf_counter()
    float(jnp.zeros(()))
    rtt = time.perf_counter() - t0
    dt = min(times) - rtt
    payload = 2 * B * T * Dkv * kq.dtype.itemsize * L  # k+v streamed/step
    scales = (2 * B * T * Hkv * 4 * L) if ks is not None else 0
    print(f"{tag:10s} {dt * 1e3:8.2f} ms/22-layer walk | payload "
          f"{payload / GIB:.2f} GiB -> roofline {payload / GIB / 704 * 1e3:6.2f} ms"
          f" | logical scales {scales / GIB:.3f} GiB", flush=True)


def main():
    rs = np.random.RandomState(0)
    which = sys.argv[1:] or ["int8", "int8_nosc", "bf16"]
    if "int8" in which or "int8_nosc" in which:
        kq = jnp.asarray(rs.randint(-127, 128, (L, B, T, Dkv)), jnp.int8)
        vq = jnp.asarray(rs.randint(-127, 128, (L, B, T, Dkv)), jnp.int8)
        if "int8" in which:
            # T-minor scale planes ("sT") — lanes carry the key axis, so the
            # tiled HBM image pads only the Hkv sublanes (2x, vs ~32x for
            # the old (L, B, T, Hkv) planes this bench diagnosed)
            ks = jnp.asarray(np.abs(rs.randn(L, B, Hkv, T)) * .01 + .01,
                             jnp.float32)
            vs = jnp.asarray(np.abs(rs.randn(L, B, Hkv, T)) * .01 + .01,
                             jnp.float32)
            run_variant("int8", kq, ks, vq, vs)
        if "int8_nosc" in which:
            run_variant("int8_nosc", kq, None, vq, None)
        del kq, vq
    if "bf16" in which:
        kf = jnp.asarray(rs.randn(L, B, T, Dkv) * 0.1, jnp.bfloat16)
        vf = jnp.asarray(rs.randn(L, B, T, Dkv) * 0.1, jnp.bfloat16)
        run_variant("bf16", kf, None, vf, None)


if __name__ == "__main__":
    main()
