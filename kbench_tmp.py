import time
import jax, jax.numpy as jnp

D, N, BATCH = 300, 8192, 16384
pool = jax.random.uniform(jax.random.key(1), (D, N))
poolT = pool.T
W = jax.random.uniform(jax.random.key(2), (D, 25))
REPS = 300

def timeit(name, f):
    def many(key):
        def body(c, k):
            idx = jax.random.randint(k, (BATCH,), 0, N)
            out = f(idx)
            # consume with a cheap reduction that can't elide the gather
            return c + jnp.sum(out[:, ::997]), ()
        keys = jax.random.split(key, REPS)
        c, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return c
    g = jax.jit(many)
    float(g(jax.random.key(0)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(jax.random.key(0)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REPS*1e6:8.1f} us")

timeit("take axis=1 (cols)      ", lambda idx: jnp.take(pool, idx, axis=1))
timeit("take rows of poolT + .T ", lambda idx: jnp.take(poolT, idx, axis=0).T)
timeit("pool[:, idx]            ", lambda idx: pool[:, idx])
timeit("one-sided: proj gather  ", lambda idx: jnp.take(W.T @ pool, idx, axis=1))
# gather rows WITHOUT transposing back (consumer could work transposed)
def rows_only(idx):
    return jnp.take(poolT, idx, axis=0)
def many2(key):
    def body(c, k):
        idx = jax.random.randint(k, (BATCH,), 0, N)
        out = rows_only(idx)
        return c + jnp.sum(out[::997, :]), ()
    keys = jax.random.split(key, REPS)
    c, _ = jax.lax.scan(body, jnp.float32(0), keys)
    return c
g = jax.jit(many2)
float(g(jax.random.key(0)))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(g(jax.random.key(0)))
    best = min(best, time.perf_counter() - t0)
print(f"take rows, stay transposed: {best/REPS*1e6:8.1f} us")
