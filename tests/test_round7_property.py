"""Round-7 property tests: WAV codec roundtrip over arbitrary PCM
clips, and MMR integer-score determinism under candidate permutation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from activity_classifier_spark_cassandra_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
)

_S16 = st.integers(min_value=-32768, max_value=32767)
_S8 = st.integers(min_value=-128, max_value=127)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    samples=st.lists(_S16, min_size=1, max_size=400),
    sr=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=4),
)
def test_wav16_roundtrip_any_clip(samples, sr, channels):
    usable = samples[: len(samples) - (len(samples) % channels)]
    if not usable:
        usable = samples[:1] * channels
    blob = encode_wav(sr, usable, bits=16, channels=channels)
    got_sr, got_ch, bits, n_frames, got = decode_wav(blob)
    assert (got_sr, got_ch, bits) == (sr, channels, 16)
    assert n_frames == len(usable) // channels
    assert got == usable


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(samples=st.lists(_S8, min_size=1, max_size=400))
def test_wav8_roundtrip_any_clip(samples):
    blob = encode_wav(8000, samples, bits=8, channels=1)
    _, _, bits, n_frames, got = decode_wav(blob)
    assert bits == 8
    assert n_frames == len(samples)
    assert got == samples


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rel=st.lists(
        st.integers(min_value=-1_000_000, max_value=1_000_000),
        min_size=6,
        max_size=10,
        unique=True,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_mmr_greedy_is_permutation_invariant(rel, seed):
    """The integer-scored greedy (the exact arithmetic q_mmr_rerank and
    its oracle share) must be independent of candidate enumeration
    order — the tie-break is (score, doc_id), a total order."""
    import random

    n = len(rel)
    rel_e6 = {i: r for i, r in enumerate(rel)}
    rng = random.Random(seed)
    sim_e6 = {
        (a, b): rng.randint(-1_000_000, 1_000_000)
        for a in range(n)
        for b in range(n)
        if a != b
    }
    # symmetrize like real cosines
    for a in range(n):
        for b in range(a + 1, n):
            sim_e6[(b, a)] = sim_e6[(a, b)]

    def greedy(order):
        first = max(order, key=lambda d: (rel_e6[d], -d))
        picked = [(first, 0)]
        while len(picked) < 5:
            chosen = {d for d, _ in picked}
            best = None
            for d in order:
                if d in chosen:
                    continue
                ms = max(sim_e6[(d, p)] for p, _ in picked)
                key = (7 * rel_e6[d] - 3 * ms, -d)
                if best is None or key > best[0]:
                    best = (key, d, ms)
            picked.append((best[1], best[2]))
        return picked

    base = list(range(n))
    shuffled = base[:]
    rng.shuffle(shuffled)
    assert greedy(base) == greedy(shuffled)
