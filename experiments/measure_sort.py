"""Measure jax.lax.sort / argsort throughput on TPU at ray-batch sizes.

Feasibility probe for sort-based ray binning: gathers cost ~8 ns/element on
this backend, but sort is pure vector work — if a 131K-lane 8-operand sort
costs well under a millisecond, sorting rays into (cell, octant) bins before
the block-synchronous BVH walk turns incoherent blocks coherent.

Timing: slope method inside one jit (scan over k varied iterations), per
CLAUDE.md — repeat-execution timings through the tunnel are unreliable.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 131072
rng = np.random.default_rng(0)
key0 = jnp.asarray(rng.integers(0, 512, N), jnp.int32)
payloads = [jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(7)]


def slope(body_fn, k_lo=4, k_hi=64):
    def run(k):
        @jax.jit
        def f(seed):
            def body(c, i):
                out = body_fn(i + seed)
                return c + out, None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k, dtype=jnp.int32))
            return c

        f(jnp.int32(0)).block_until_ready()  # compile + warm
        t0 = time.time()
        f(jnp.int32(7)).block_until_ready()
        return time.time() - t0

    t_lo = run(k_lo)
    t_hi = run(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    # 8-operand sort (key + 7 ray fields)
    def sort8(i):
        k = (key0 + i) % 512
        outs = jax.lax.sort([k] + payloads, num_keys=1)
        return outs[1].sum()

    t = slope(sort8)
    print(f"sort 8-operand N={N}: {t*1e3:.3f} ms")

    # argsort + would-be gather comparison: argsort only
    def argsort1(i):
        k = (key0 + i) % 512
        return jnp.argsort(k).sum().astype(jnp.float32)

    t = slope(argsort1)
    print(f"argsort N={N}: {t*1e3:.3f} ms")

    # gather of 7 payloads by random permutation (the alternative we avoid)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    def gather7(i):
        p = (perm + i) % N
        return sum(pl[p].sum() for pl in payloads)

    t = slope(gather7)
    print(f"gather 7 payloads N={N}: {t*1e3:.3f} ms")

    # counting-sort alternative: key histogram + prefix + scatter — measure
    # one_hot-based binning for small K
    def seg_offsets(i):
        k = (key0 + i) % 512
        hist = jnp.zeros((512,), jnp.int32).at[k].add(1)
        return jnp.cumsum(hist).sum().astype(jnp.float32)

    t = slope(seg_offsets)
    print(f"histogram+cumsum K=512: {t*1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
