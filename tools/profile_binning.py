"""Time each op inside bin_gaussians on TPU at bench shapes."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from msgs.core.camera import make_camera
    from msgs.kernels.preprocess import preprocess, TILE
    from msgs.kernels.binning import BLOCK, entry_capacity

    N, W, H = 100_000, 1920, 1080
    ENTRY_CAP = 1 << 21
    rng = np.random.default_rng(0)
    means = np.concatenate([rng.uniform(-3,3,(N,2)), rng.uniform(2,12,(N,1))],1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5,-2.5,(N,3))).astype(np.float32)
    quats = rng.normal(size=(N,4)).astype(np.float32)
    opac = rng.uniform(0.2,0.9,N).astype(np.float32)
    cols = rng.uniform(0,1,(N,3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.8, W, H)
    args = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, cols))
    pre = jax.jit(lambda m,s,q,o,c: preprocess(cam, m, o, colors_precomp=c, scales=s, quats=q))(*args)
    jax.block_until_ready(pre)

    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    T = tiles_x * tiles_y
    E_cap = entry_capacity(ENTRY_CAP, T)
    B_cap = E_cap // BLOCK

    def timeit(name, f, *a, n=10):
        r = jax.block_until_ready(jax.jit(f)(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            r = jax.jit(f)(*a)
        jax.block_until_ready(r)
        print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms", flush=True)
        return r

    # stage 1: counts/offsets
    def s1(pre):
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
        rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 0)
        counts = jnp.where(pre.visible, rect_w * rect_h, 0).astype(jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        return counts, offsets
    counts, offsets = timeit("counts+cumsum", s1, pre)

    def s2(counts, offsets):
        total = offsets[-1] + counts[-1]
        counts_ext = jnp.concatenate([counts, jnp.maximum(ENTRY_CAP - total, 0)[None]])
        ids_ext = jnp.arange(N + 1, dtype=jnp.int32)
        gid = jnp.repeat(ids_ext, counts_ext, total_repeat_length=ENTRY_CAP)
        return gid
    gid = timeit("repeat", s2, counts, offsets)

    def s3(gid, offsets, pre):
        valid = gid < N
        gid_c = jnp.minimum(gid, N - 1)
        slot = jnp.arange(ENTRY_CAP, dtype=jnp.int32) - offsets[gid_c]
        rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
        w = jnp.maximum(rect_w[gid_c], 1)
        tx = pre.rect_min[gid_c, 0] + slot % w
        ty = pre.rect_min[gid_c, 1] + slot // w
        tile = ty * tiles_x + tx
        tile_key = jnp.where(valid, tile, T).astype(jnp.int32)
        depth_key = jnp.where(valid, pre.depths[gid_c], jnp.inf)
        return tile_key, depth_key
    tile_key, depth_key = timeit("tile keys (gathers)", s3, gid, offsets, pre)

    def s4(tile_key, depth_key, gid):
        return jax.lax.sort((tile_key, depth_key, gid.astype(jnp.int32)), num_keys=2, is_stable=True)
    tile_s, _, gid_s = timeit("main sort", s4, tile_key, depth_key, gid)

    def s5(tile_s):
        bounds = jnp.searchsorted(tile_s, jnp.arange(T + 1, dtype=jnp.int32), side="left").astype(jnp.int32)
        return bounds
    bounds = timeit("searchsorted bounds", s5, tile_s)

    def s6(bounds):
        tile_start = bounds[:T]
        tile_counts = bounds[1:] - bounds[:T]
        padded_counts = ((tile_counts + BLOCK - 1) // BLOCK) * BLOCK
        padded_start = jnp.cumsum(padded_counts) - padded_counts
        block_idx = jnp.arange(B_cap, dtype=jnp.int32)
        block_tile = (jnp.searchsorted(padded_start, block_idx * BLOCK, side="right") - 1).astype(jnp.int32)
        return tile_start, tile_counts, padded_start, jnp.clip(block_tile, 0, T - 1)
    tile_start, tile_counts, padded_start, block_tile = timeit("block map", s6, bounds)

    def s7(block_tile, padded_start, tile_start, tile_counts, gid_s):
        out_t = block_tile[jnp.arange(E_cap, dtype=jnp.int32) // BLOCK]
        r = jnp.arange(E_cap, dtype=jnp.int32) - padded_start[out_t]
        src = tile_start[out_t] + r
        slot_valid = (r >= 0) & (r < tile_counts[out_t])
        return jnp.where(slot_valid, gid_s[jnp.clip(src, 0, ENTRY_CAP - 1)], -1)
    gauss_id = timeit("inverse gather", s7, block_tile, padded_start, tile_start, tile_counts, gid_s)

    def s8(gauss_id):
        gk = jnp.where(gauss_id >= 0, gauss_id, N).astype(jnp.int32)
        return jax.lax.sort((gk, jnp.arange(E_cap, dtype=jnp.int32)), num_keys=1, is_stable=True)
    timeit("gid sort", s8, gauss_id)

if __name__ == "__main__":
    main()
