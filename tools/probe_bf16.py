"""VPU bf16-vs-f32 microprobe (real chip): decides whether bf16 gate
arithmetic in the traversal kernel can win at all on this silicon.

Measures, in Pallas kernels over resident VMEM tiles:
  1. fma-chain throughput: f32 [8,128] vs bf16 [16,128] tiles, same
     element count — if bf16 elementwise does NOT run ~2x f32, the
     bf16-gates lever is dead (the traversal gates are VPU-bound, not
     bandwidth-bound: cluster meta lives in SMEM scalars).
  2. HBM->VMEM streaming: elementwise over a large f32 vs bf16 array —
     the bandwidth-bound regime (fused-pipeline intermediates), where
     bf16 should approach 2x by bytes alone.

Run: python tools/probe_bf16.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 512   # fma ops per element per outer iteration
CHAINS = 8     # independent accumulator chains (hide fma latency)
INNER = 8      # fori iterations inside the kernel
BATCH = 8      # dispatches per timed sync (dispatch floor ~24 ms SYNCED,
               # but async dispatch pipelines — PERF.md round-4 #7)


def make_fma_kernel(dtype, rows):
    """Throughput, not latency: CHAINS independent fma chains per element
    and an in-kernel fori loop so compute >> dispatch/DMA."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        c = jnp.asarray(1.0000001, dtype)
        d = jnp.asarray(1e-7, dtype)

        def body(_, accs):
            return tuple(a * c + d for a in accs)

        accs = tuple(x + jnp.asarray(i, dtype) for i in range(CHAINS))
        for _ in range(UNROLL // CHAINS):
            accs = tuple(a * c + d for a in accs)
        accs = jax.lax.fori_loop(0, INNER - 1, body, accs)
        # NOTE: fori body carries ALL chains, so total fma count per
        # element = UNROLL + (INNER-1) * CHAINS... keep it simple:
        # count only the unrolled part (the fori adds a small tail)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0] // rows,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
            interpret=jax.default_backend() == "cpu",
        )(x)

    return run


def bench(name, fn, x, iters, flops_per_el):
    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))  # sync (block_until_ready lies)
    dt = float("inf")
    for _ in range(iters):
        t0 = time.time()
        for _ in range(BATCH):
            y = fn(x)
        float(jnp.sum(y.astype(jnp.float32)))
        dt = min(dt, (time.time() - t0) / BATCH)
    n = x.size
    print(f"{name:24s}: {dt*1e3:8.2f} ms  "
          f"{n * flops_per_el / dt / 1e9:8.1f} GFLOP/s  "
          f"({n * x.dtype.itemsize * 2 / dt / 1e9:6.2f} GB/s r+w)",
          flush=True)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("backend:", jax.default_backend(), flush=True)

    # 1. VPU fma chains, VMEM-resident tiles. flops/element ~ 2 *
    # (UNROLL + (INNER-1)*CHAINS) + CHAINS
    flops = 2 * (UNROLL + (INNER - 1) * CHAINS)
    n_rows = 8192
    xf = jnp.ones((n_rows, 128), jnp.float32) * 0.5
    xb = xf.astype(jnp.bfloat16)
    bench("fma f32 [8,128] tiles", make_fma_kernel(jnp.float32, 8), xf,
          iters, flops)
    bench("fma bf16 [16,128] tiles", make_fma_kernel(jnp.bfloat16, 16), xb,
          iters, flops)
    bench("fma bf16 [8,128] tiles", make_fma_kernel(jnp.bfloat16, 8), xb,
          iters, flops)

    # 2. bandwidth-bound: one multiply over a 512 MB array (f32) vs the
    # same element count in bf16 — effective HBM GB/s each way
    big = 1 << 27  # 128M elements
    yf = jnp.ones((big // 128, 128), jnp.float32) * 1.5

    @jax.jit
    def scale_f(v):
        return v * 1.000001

    yb = yf.astype(jnp.bfloat16)
    bench("hbm stream f32", scale_f, yf, iters, 1)
    bench("hbm stream bf16", scale_f, yb, iters, 1)


if __name__ == "__main__":
    main()
