"""Microbenchmark the actual machine: HBM read bandwidth, VPU elementwise
throughput, MXU matmul at DEFAULT vs HIGHEST precision — the roofline
constants the bench reports against (BENCH_NOTES.md)."""

import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

N = 10_000_000


def timeit(f, *a, reps=5):
    o = f(*a)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        o = f(*a)
        jax.block_until_ready(o)
        best = min(best, time.time() - t0)
    return best


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 2), jnp.float32)

    # to amortize dispatch, run each op 20x inside one jit via scan with
    # a varying scalar so nothing is CSE'd
    def scanned(op):
        @jax.jit
        def f(x):
            def body(c, i):
                return c + op(x + i * 0.0), None   # i breaks CSE? no: i*0.0 folds
            return jax.lax.scan(body, jnp.zeros(()), jnp.arange(20.0))[0]
        return f

    def scanned_varying(op):
        @jax.jit
        def f(x):
            def body(c, i):
                return c + op(x, c), None
            return jax.lax.scan(body, jnp.zeros(()), jnp.arange(20.0))[0]
        return f

    # HBM read: sum over 80 MB, carry-dependent offset defeats CSE
    t = timeit(scanned_varying(lambda x, c: jnp.sum(x + c)), x) / 20
    print(f'sum(x+c) 80MB read:     {t*1e3:7.3f} ms  -> {80e-3/t:6.1f} GB/s')

    # HBM copy: read+write 160 MB
    t = timeit(scanned_varying(lambda x, c: jnp.sum((x * (1 + c))[::97, 0])), x) / 20
    print(f'scale+strided-sum:      {t*1e3:7.3f} ms')

    # VPU exp over N x 50
    y = jax.random.normal(jax.random.PRNGKey(1), (1_000_000, 50), jnp.float32)
    t = timeit(scanned_varying(lambda y, c: jnp.sum(jnp.exp(y + c))), y) / 20
    print(f'exp 1e6x50 + sum:       {t*1e3:7.3f} ms  -> {5e7/t/1e9:6.2f} Gexp/s')

    # MXU: (N, 8) @ (8, 56) at both precisions, then (N, 128) @ (128, 128)
    f8 = jax.random.normal(jax.random.PRNGKey(2), (N, 8), jnp.float32)
    th = jax.random.normal(jax.random.PRNGKey(3), (8, 56), jnp.float32)
    for prec in ('default', 'highest'):
        t = timeit(scanned_varying(
            lambda f8, c, p=prec: jnp.sum(jax.lax.dot(
                f8 + c, th, precision=p)), ), f8) / 20
        flops = 2 * N * 8 * 56
        print(f'(1e7,8)@(8,56) {prec:8s}: {t*1e3:7.3f} ms  -> {flops/t/1e12:6.2f} TFLOP/s')

    big = jax.random.normal(jax.random.PRNGKey(4), (1_000_000, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (128, 128), jnp.float32)
    for prec in ('default', 'highest'):
        t = timeit(scanned_varying(
            lambda big, c, p=prec: jnp.sum(jax.lax.dot(
                big + c, w, precision=p)), ), big) / 20
        flops = 2 * 1_000_000 * 128 * 128
        print(f'(1e6,128)@(128,128) {prec:8s}: {t*1e3:7.3f} ms  -> {flops/t/1e12:6.2f} TFLOP/s')

    bigb = big.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    t = timeit(scanned_varying(
        lambda bigb, c, : jnp.sum(jax.lax.dot(
            bigb + c.astype(jnp.bfloat16), wb,
            preferred_element_type=jnp.float32)), ), bigb) / 20
    flops = 2 * 1_000_000 * 128 * 128
    print(f'(1e6,128)@(128,128) bf16 in: {t*1e3:7.3f} ms  -> {flops/t/1e12:6.2f} TFLOP/s')


if __name__ == '__main__':
    main()
