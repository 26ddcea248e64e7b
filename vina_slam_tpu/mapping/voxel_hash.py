"""Open-addressing voxel hash table primitives.

TPU-native replacement for the reference's hash-of-octrees
(include/vina_slam/core/types.hpp:13-41 + mapping/octree.hpp): instead of
pointer-chased OctoTree nodes behind a std::unordered_map, every octree node
at every level lives in ONE flat open-addressing table keyed by an int64
encoding of (level, ix, iy, iz). Lookup is a vectorized linear probe
(gather + compare over a fixed window); insertion of new keys is a
parallel claim-and-verify loop (scatter, re-gather, advance losers) that
needs no atomics and converges in <= PROBE rounds.

Coordinates at level l use voxel edge voxel_size / 2^l; integer coords are
floor(x / edge) exactly like the reference's float-cast trick
(voxel_map.cpp:13-21).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

COORD_BITS = 20
COORD_OFF = 1 << (COORD_BITS - 1)     # supports |ix| < 2^19 voxels
COORD_MASK = (1 << COORD_BITS) - 1
EMPTY_KEY = jnp.int64(-1)


def coords_of(pts: jnp.ndarray, edge) -> jnp.ndarray:
    """World points (..., 3) -> integer voxel coords (..., 3) at a level."""
    return jnp.floor(pts / edge).astype(jnp.int32)


def encode(level: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """(level, (...,3) int coords) -> int64 key. Exact (no collision) within
    |coord| < 2^19; out-of-range coords clamp (far beyond any map extent)."""
    c = jnp.clip(coords.astype(jnp.int64) + COORD_OFF, 0, COORD_MASK)
    lv = jnp.asarray(level, jnp.int64)
    return (((lv << COORD_BITS | c[..., 0]) << COORD_BITS | c[..., 1]) << COORD_BITS) | c[..., 2]


def decode(key: jnp.ndarray):
    z = (key & COORD_MASK) - COORD_OFF
    y = ((key >> COORD_BITS) & COORD_MASK) - COORD_OFF
    x = ((key >> (2 * COORD_BITS)) & COORD_MASK) - COORD_OFF
    lv = key >> (3 * COORD_BITS)
    return lv.astype(jnp.int32), jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def _mix(key: jnp.ndarray) -> jnp.ndarray:
    """64-bit splitmix-style hash of the key."""
    h = key.astype(jnp.uint64)
    h = (h ^ (h >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> 27)) * jnp.uint64(0x94D049BB133111EB)
    return h ^ (h >> 31)


@partial(jax.jit, static_argnames=("probe",))
def find_slots(table_keys: jnp.ndarray, query: jnp.ndarray, probe: int = 16) -> jnp.ndarray:
    """Vectorized lookup: query (N,) int64 keys -> slot (N,) int32. Absent
    keys return -1 when the probe window still has an empty slot (an insert
    could succeed) and -2 when the window is full (unplaceable until evict()
    rebuilds). Callers that only test presence use slot >= 0; creation paths
    retry ONLY the -1 case — retrying window-full keys made every skipped
    create wave re-run its insert scan forever. Entries are never deleted
    mid-chain without tombstones, so probing may rely on empties."""
    C = table_keys.shape[0]
    mask = jnp.uint64(C - 1)
    h0 = (_mix(query) & mask).astype(jnp.int32)
    offs = jnp.arange(probe, dtype=jnp.int32)
    cand = (h0[:, None] + offs[None, :]) & jnp.int32(C - 1)
    occupants = table_keys[cand]                      # (N, probe)
    hit = occupants == query[:, None]
    any_hit = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1)
    slot = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
    has_space = jnp.any(occupants == EMPTY_KEY, axis=1)
    return jnp.where(any_hit, slot, jnp.where(has_space, -1, -2))


def hash_fp(query: jnp.ndarray, C: int):
    """One _mix evaluation -> (home slot h0, int32 fingerprint) of int64
    keys. The fingerprint uses the TOP 31 bits of the mix (fingerprint32)
    while h0 uses the low log2(C) bits — independent for C <= 2^20."""
    h = _mix(query)
    h0 = (h & jnp.uint64(C - 1)).astype(jnp.int32)
    fp = (h >> jnp.uint64(33)).astype(jnp.int32) + 1
    return h0, fp


@partial(jax.jit, static_argnames=("probe",))
def find_slots_fp(fkeys: jnp.ndarray, query: jnp.ndarray,
                  probe: int = 16) -> jnp.ndarray:
    """find_slots against the int32 fingerprint shadow table, reading the
    probe window as CONTIGUOUS 8-wide ROWS instead of `probe` element
    gathers: 2 row-gathers of native int32 cost ~2 ms at 40k queries where
    the 8 element-gathers of emulated int64 cost ~6 ms (micro_gather.py).

    A fingerprint collision (2^-31 per probed slot) can misreport an absent
    key as present: harmless for match paths (the Mahalanobis gate absorbs
    one misassociation) and vanishingly rare for create paths (one point
    cluster merged into a neighboring voxel). The exact int64 table remains
    authoritative for insertion (insert_keys claim-and-verify).

    Same return convention as find_slots: slot, or -1 (absent, space in
    window) / -2 (absent, window full)."""
    C = fkeys.shape[0]
    R = C // 8
    rows = fkeys.reshape(R, 8)
    h0, fp = hash_fp(query, C)
    r0 = h0 >> 3
    nrows = (probe + 14) // 8  # covers offsets (h0 & 7) .. (h0 & 7) + probe
    cand = jnp.concatenate(
        [rows[(r0 + k) & jnp.int32(R - 1)] for k in range(nrows)],
        axis=-1)                                   # (N, 8*nrows)
    j = jnp.arange(8 * nrows, dtype=jnp.int32)
    off = j[None, :] - (h0 & 7)[:, None]           # window-relative offset
    inwin = (off >= 0) & (off < probe)
    hit = inwin & (cand == fp[:, None])
    any_hit = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1).astype(jnp.int32)
    slot = ((r0 << 3) + first) & jnp.int32(C - 1)
    has_space = jnp.any(inwin & (cand == 0), axis=1)
    return jnp.where(any_hit, slot, jnp.where(has_space, -1, -2))


@partial(jax.jit, static_argnames=("probe", "rounds"))
def insert_keys(table_keys: jnp.ndarray, new_keys: jnp.ndarray, valid: jnp.ndarray,
                probe: int = 16, rounds: int = 16):
    """Parallel insertion of (pre-deduplicated) new keys.

    Claim-and-verify: each round, every unplaced key scatters itself into its
    current probe slot if that slot is empty; a re-gather reveals the winner;
    losers advance their probe offset. Duplicated keys (same key twice in
    new_keys) also converge: the second instance sees its own key and is done.

    The round loop is an EARLY-EXIT while_loop: at typical load factors
    every key lands in 1-2 rounds (claim + verify), and a fixed `rounds`-long
    scan paid the full per-round scatter/gather latency (~0.4 ms each)
    regardless — this while was the single hottest op family in the fused
    step profile. `rounds` remains the worst-case bound.

    Returns (table_keys, slots, placed): slots==-1 where dropped (either
    invalid or probe window exhausted — table near capacity)."""
    C = table_keys.shape[0]
    cmask = jnp.int32(C - 1)
    h0 = (_mix(new_keys) & jnp.uint64(C - 1)).astype(jnp.int32)

    def cond(carry):
        keys, offset, done, slots, it, pending = carry
        return pending & (it < rounds)

    def body(carry):
        keys, offset, done, slots, it, _ = carry
        slot_try = (h0 + offset) & cmask
        occ = keys[slot_try]
        need = valid & ~done
        can_claim = need & (occ == EMPTY_KEY)
        keys = keys.at[slot_try].set(
            jnp.where(can_claim, new_keys, occ), mode="drop"
        )
        occ2 = keys[slot_try]
        won = need & (occ2 == new_keys)
        slots = jnp.where(won, slot_try, slots)
        done = done | won
        # advance losers, but not past the probe window
        offset = jnp.where(done | ~valid, offset, jnp.minimum(offset + 1, probe - 1))
        return (keys, offset, done, slots, it + 1, jnp.any(valid & ~done))

    init = (
        table_keys,
        jnp.zeros_like(h0),
        jnp.zeros_like(valid),
        jnp.full_like(h0, -1),
        jnp.asarray(0, jnp.int32),
        jnp.any(valid),
    )
    table_keys, _, done, slots, _, _ = jax.lax.while_loop(cond, body, init)
    return table_keys, slots, done


EMPTY32 = jnp.int32(-1)


def fingerprint32(key: jnp.ndarray) -> jnp.ndarray:
    """int64 voxel key -> positive int32 fingerprint (never EMPTY32).

    For THROWAWAY per-scan tables only (downsampling, scan-plane
    voxelization): int64 table ops cost 2x on TPU (u32-pair emulation), and
    a ~1e-3-per-scan fingerprint collision merely merges two voxels'
    points for one scan. The persistent map table keeps exact int64 keys."""
    h = _mix(key)
    return ((h >> jnp.uint64(33)).astype(jnp.int32) + 1)  # in [1, 2^31]


@partial(jax.jit, static_argnames=("probe", "rounds", "quadratic"))
def insert_keys32(table_keys: jnp.ndarray, new_keys: jnp.ndarray,
                  valid: jnp.ndarray, probe: int = 16, rounds: int = 16,
                  quadratic: bool = False):
    """insert_keys for int32 fingerprint tables (same early-exit
    claim-and-verify; see insert_keys).

    quadratic=True probes the triangular-number sequence h0 + i(i+1)/2
    (which visits every slot of a power-of-two table) instead of linear
    h0 + i. Linear probing's primary clustering made the per-scan
    downsample table the hottest piece of the 20k-pt fused step: at load
    ~0.5 the longest cluster needed ~30 claim-and-verify rounds of the
    full (N,) gather+scatter, while quadratic probing's cluster-hopping
    converges in <= ~8 (measured, scripts/micro_big.py). Only meaningful
    for throwaway tables whose slots never get re-probed by a separate
    find pass — the probe SEQUENCE is baked into the returned slots."""
    C = table_keys.shape[0]
    cmask = jnp.int32(C - 1)
    h = new_keys.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
    h = (h ^ (h >> 16)) * jnp.uint32(0x45D9F3B)
    h0 = ((h ^ (h >> 16)) & jnp.uint32(C - 1)).astype(jnp.int32)

    def cond(carry):
        keys, offset, step, done, slots, it, pending = carry
        return pending & (it < rounds)

    def body(carry):
        keys, offset, step, done, slots, it, _ = carry
        slot_try = (h0 + offset) & cmask
        occ = keys[slot_try]
        need = valid & ~done
        can_claim = need & (occ == EMPTY32)
        keys = keys.at[slot_try].set(
            jnp.where(can_claim, new_keys, occ), mode="drop")
        occ2 = keys[slot_try]
        won = need & (occ2 == new_keys)
        slots = jnp.where(won, slot_try, slots)
        done = done | won
        if quadratic:
            adv = offset + step
        else:
            adv = jnp.minimum(offset + 1, probe - 1)
        offset = jnp.where(done | ~valid, offset, adv)
        return (keys, offset, step + 1, done, slots, it + 1,
                jnp.any(valid & ~done))

    init = (table_keys, jnp.zeros_like(h0), jnp.asarray(1, jnp.int32),
            jnp.zeros_like(valid),
            jnp.full_like(h0, -1), jnp.asarray(0, jnp.int32), jnp.any(valid))
    table_keys, _, _, done, slots, _, _ = jax.lax.while_loop(cond, body, init)
    return table_keys, slots, done


def compact_indices(mask: jnp.ndarray, size: int, fill: int) -> jnp.ndarray:
    """Ascending indices of True entries, padded with `fill` to `size`
    (jnp.nonzero(mask, size, fill)[0] equivalent). Overflowing trues
    (position >= size) are dropped.

    On TPU this is the Pallas stream-compaction kernel
    (ops/pallas_compact.py, ~0.1 ms at 40k rows); elsewhere ONE int32
    lax.sort of (mask ? index : n) — 2.6x faster on TPU than the earlier
    triangular-matmul prefix-sum + scatter form but still ~1.2-1.5 ms at
    40k, which made this primitive the hottest op family of the fused step
    (it backs recut re-descents, BA extraction, margi refresh, and the
    IEKF re-walk). The sort is also while-loop-safe where a cumsum is not
    (the TPU cumsum lowering requests ~64 MB scoped vmem there)."""
    if jax.default_backend() == "tpu":
        from vina_slam_tpu.ops.pallas_compact import compact_indices_tpu
        return compact_indices_tpu(mask, size, fill)
    n = mask.shape[0]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    if size > n:
        key = jnp.concatenate([key, jnp.full(size - n, n, jnp.int32)])
    srt = jax.lax.sort(key)[:size]
    return jnp.where(srt < n, srt, fill)


def unique_keys(keys: jnp.ndarray, valid: jnp.ndarray, size: int):
    """Deduplicate an (N,) int64 key set to a fixed-size unique list.
    Invalid entries map to EMPTY_KEY which is excluded."""
    k = jnp.where(valid, keys, EMPTY_KEY)
    uniq = jnp.unique(k, size=size + 1, fill_value=EMPTY_KEY)
    # EMPTY_KEY == -1 sorts first when present; strip it
    has_empty = uniq[0] == EMPTY_KEY
    uniq = jnp.where(has_empty, jnp.roll(uniq, -1), uniq)[:size]
    uniq = jnp.where(has_empty & (jnp.arange(size) == size - 1), EMPTY_KEY, uniq)
    return uniq, uniq != EMPTY_KEY
