"""One-hot gather matmul precision variants (real chip).

The attribute-fetch one-hot matmul (core/gather.py) runs at
Precision.HIGHEST — XLA's multi-pass bf16 emulation splits BOTH
operands, but the one-hot operand is EXACT in bf16 (entries 0/1), so
splitting it is pure waste. Candidates:

  highest   current: precision=HIGHEST on both operands
  tuple     per-operand precision=(DEFAULT, HIGHEST) — one pass on the
            one-hot side, full split on the table side
  split3    manual 3-term bf16 table split, 3 DEFAULT matmuls (f32 acc)
  split2    manual 2-term split (error ~2^-17 — NOT exact, shown for
            the cost/accuracy frontier)
  default   single-pass bf16 (error ~2^-9)

Reports ms (min-over-reps) and max |err| vs table[idx] for each.
Run: python tools/probe_gather_precision.py [n_lanes] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k, c = 1024, 120
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(k, c)).astype(np.float32) * 37.3
    )
    idx = jnp.asarray(rng.integers(0, k, size=n).astype(np.int32))
    want = np.asarray(table)[np.asarray(idx)]

    iota = jnp.arange(k, dtype=jnp.int32)

    def onehot(ix):
        return (ix[:, None] == iota[None, :]).astype(jnp.float32)

    @jax.jit
    def g_highest(ix, t):
        return jnp.dot(onehot(ix), t,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    @jax.jit
    def g_tuple(ix, t):
        return jnp.dot(
            onehot(ix), t,
            precision=(jax.lax.Precision.DEFAULT,
                       jax.lax.Precision.HIGHEST),
            preferred_element_type=jnp.float32,
        )

    def split_terms(t, nterms):
        terms = []
        rem = t
        for _ in range(nterms):
            hi = rem.astype(jnp.bfloat16).astype(jnp.float32)
            terms.append(hi)
            rem = rem - hi
        return terms

    @jax.jit
    def g_split3(ix, t):
        oh = onehot(ix)
        acc = None
        for term in split_terms(t, 3):
            p = jnp.dot(oh, term, preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        return acc

    @jax.jit
    def g_split2(ix, t):
        oh = onehot(ix)
        acc = None
        for term in split_terms(t, 2):
            p = jnp.dot(oh, term, preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        return acc

    @jax.jit
    def g_default(ix, t):
        return jnp.dot(onehot(ix), t,
                       preferred_element_type=jnp.float32)

    # cheap variants first: the HIGHEST compile of a [131k, 1024]
    # one-hot matmul can be minutes (it timed out at [262k, 2048])
    for name, fn in (("default", g_default), ("split2", g_split2),
                     ("split3", g_split3), ("tuple", g_tuple),
                     ("highest", g_highest)):
        out = fn(idx, table)
        float(jnp.sum(out))
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(idx, table)
            float(jnp.sum(out))
            dt = min(dt, time.time() - t0)
        err = float(np.abs(np.asarray(out) - want).max())
        rel = err / 37.3
        print(f"{name:8s}: {dt*1e3:7.2f} ms  max|err|={err:.3e} "
              f"(rel ~{rel:.1e}) {'EXACT' if err == 0.0 else ''}",
              flush=True)


if __name__ == "__main__":
    main()
