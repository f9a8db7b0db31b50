#!/usr/bin/env python3
"""Microbenchmark: strategies for the RRTMG table interpolation
(weighted 12-row gather from a (585, ng) table, N = ncol*nlev rows)."""

import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_RTT = None


def _rtt():
    global _RTT
    if _RTT is None:
        triv = jax.jit(lambda x: x + 1.0)
        float(np.asarray(triv(jnp.float32(0.0))))
        _RTT = min(
            (lambda t0: (float(np.asarray(triv(jnp.float32(i)))),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for i in range(20))
    return _RTT


def timeit(fn, *args, n=10):
    # scalar-fetch protocol: unfetched results may never execute on
    # remote backends (see bench.py docstring)
    # sum of squares: not algebraically separable, so the full product
    # must actually be computed
    g = jax.jit(lambda *a: jnp.sum(
        sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(fn(*a)))))
    float(np.asarray(g(*args)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(g(*args)))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _rtt(), 0.0)


def main():
    N = 2048 * 137
    nrows = 585
    npairs = 12
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (npairs, N), 0, nrows, dtype=jnp.int32)
    w = jax.random.uniform(key, (npairs, N), dtype=jnp.float32)

    for ng in (16, 140):
        table = jax.random.uniform(key, (nrows, ng), dtype=jnp.float32)

        def onehot(precision):
            @jax.jit
            def f(idx, w, table):
                iota = jnp.arange(nrows, dtype=jnp.int32)
                A = None
                for d in range(npairs):
                    oh = (idx[d][:, None] == iota).astype(jnp.float32)
                    term = w[d][:, None] * oh
                    A = term if A is None else A + term
                return jnp.dot(A, table, preferred_element_type=jnp.float32,
                               precision=precision)
            return f

        @jax.jit
        def take_gather(idx, w, table):
            out = None
            for d in range(npairs):
                t = jnp.take(table, idx[d], axis=0) * w[d][:, None]
                out = t if out is None else out + t
            return out

        @jax.jit
        def take_gather_combined(idx, w, table):
            # one gather of all pairs at once
            t = jnp.take(table, idx.reshape(-1), axis=0)
            t = t.reshape(npairs, N, ng)
            return jnp.sum(w[:, :, None] * t, axis=0)

        @jax.jit
        def onehot_T(idx, w, table):
            # transposed form: (ng, 585) @ (585, N)
            iota = jnp.arange(nrows, dtype=jnp.int32)
            A = None
            for d in range(npairs):
                oh = (idx[d][None, :] == iota[:, None]).astype(jnp.float32)
                term = w[d][None, :] * oh
                A = term if A is None else A + term
            return jnp.dot(table.T, A, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        print(f"--- ng={ng}  (N={N}, nrows={nrows}, npairs={npairs})")
        for prec in ("HIGHEST", "HIGH", "DEFAULT"):
            t = timeit(onehot(getattr(jax.lax.Precision, prec)), idx, w,
                       table)
            print(f"  onehot {prec:8}: {t*1000:8.3f} ms")
        t = timeit(take_gather, idx, w, table)
        print(f"  take x12       : {t*1000:8.3f} ms")
        t = timeit(take_gather_combined, idx, w, table)
        print(f"  take combined  : {t*1000:8.3f} ms")
        t = timeit(onehot_T, idx, w, table)
        print(f"  onehot_T HIGHEST: {t*1000:8.3f} ms")


if __name__ == "__main__":
    main()
