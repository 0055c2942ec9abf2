"""Microbenchmark: XLA gather throughput on TPU vs row width / dtype.

Informs the frame-pass design (VERDICT item 1): if gather cost is per-ROW
(latency/issue-bound) rather than per-BYTE, then trilinear taps should be
restructured as ONE gather of a corner-packed row instead of 8 narrow
gathers.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(table_rows, row_ch, n_queries, dtype, reps=5):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (table_rows, row_ch), dtype)
    idx = jax.random.randint(key, (n_queries,), 0, table_rows)

    @jax.jit
    def f(t, i):
        return jnp.sum(t[i], axis=0)

    out = f(table, idx)
    float(out[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(table, idx)
        float(out[0])
    dt = (time.time() - t0) / reps
    rows_s = n_queries / dt
    bytes_s = rows_s * row_ch * table.dtype.itemsize
    log(f"rows={table_rows:>9} ch={row_ch:>5} {str(dtype):>8} q={n_queries/1e6:.1f}M"
        f" -> {dt*1e3:7.2f} ms  {rows_s/1e6:8.1f} M rows/s  {bytes_s/1e9:7.1f} GB/s")
    return rows_s, bytes_s


def main():
    n = 2_000_000
    log("== gather: 2M queries, varying row width ==")
    for ch in (1, 4, 8, 32, 104, 256, 832):
        rows = min(128**3, 16 * 1024**3 // (ch * 4 * 4))
        bench(rows, ch, n, jnp.float32)
    log("== bf16 ==")
    for ch in (8, 64, 208, 832, 1664):
        rows = min(128**3, 16 * 1024**3 // (ch * 2 * 4))
        bench(rows, ch, n, jnp.bfloat16)
    log("== small table (VMEM-size), f32 ==")
    bench(4096, 8, n, jnp.float32)
    bench(32768, 8, n, jnp.float32)
    log("== fewer queries (0.5M) wide rows ==")
    bench(128**3 // 8, 832, 500_000, jnp.bfloat16)


if __name__ == "__main__":
    main()
