"""Property-based tests (hypothesis), mirroring the reference's randomized
unit tests (rotation invertibility, Webster seat allocation properties,
pack/unpack round-trips)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vectorchord_spark import kernels as K
from vectorchord_spark.operators.kmeans import sainte_lague_seats

finite_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_f32, min_size=1, max_size=200))
def test_rotation_roundtrip_property(xs):
    v = np.array(xs, np.float32)
    rot = K.rotate(v)
    back = K.rotate_inverse(rot)
    scale = max(1.0, float(np.abs(v).max()))
    assert np.allclose(back, v, atol=2e-5 * scale)
    # orthogonality: norm preserved
    assert np.isclose(
        np.linalg.norm(rot), np.linalg.norm(v), rtol=1e-4, atol=1e-4 * scale
    )


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=300).flatmap(
        lambda d: st.lists(
            st.lists(st.booleans(), min_size=d, max_size=d),
            min_size=1,
            max_size=5,
        )
    )
)
def test_pack_unpack_property(rows):
    signs = np.array(rows, bool)
    d = signs.shape[1]
    assert np.array_equal(
        K.unpack_bits(K.pack_bits(signs), d).astype(bool), signs
    )


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=500),
)
def test_sainte_lague_properties(weights, total):
    w = np.array(weights, np.float64)
    seats = sainte_lague_seats(w, total)
    # exact seat total (when enough positive-weight partitions exist)
    n_pos = int((w > 0).sum())
    if n_pos == 0:
        assert seats.sum() == 0
        return
    if n_pos <= total:
        assert seats.sum() == total
        # every live partition seated
        assert all(seats[w > 0] >= 1)
    else:
        assert seats.sum() == total
    # zero-weight partitions get nothing
    assert all(seats[w == 0] == 0)
    # monotonicity: strictly larger weight never gets fewer seats
    order = np.argsort(w)
    for a, b in zip(order, order[1:]):
        if w[b] > w[a]:
            assert seats[b] >= seats[a]


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=2, max_value=128).flatmap(
        lambda d: st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=d,
            max_size=d,
        )
    )
)
def test_quantize8_roundtrip_property(xs):
    v = np.array(xs, np.float32)
    if np.linalg.norm(v) < 1e-3:
        return
    rot = K.rotate(v)
    c = K.extended_code(rot, 8)
    back = K.extended_dequantize(c["code"], c["dis_u_2"], c["norm_of_lattice"], 8)[0]
    # relative reconstruction error bounded (8-bit lattice: ~1% of norm)
    assert np.linalg.norm(back - v) <= 0.05 * np.linalg.norm(v) + 1e-3


f32_any = st.floats(width=32, allow_nan=True, allow_infinity=True)


@settings(max_examples=50, deadline=None)
@given(st.lists(f32_any, min_size=0, max_size=500))
def test_vector_wire_roundtrip_property(xs):
    """pgvector wire format: bit-exact round-trip for every f32 value
    including ±inf, ±0, subnormals, and NaN payloads."""
    from vectorchord_spark.sources.tables import (
        pack_vector_wire,
        unpack_vector_wire,
    )

    v = np.array(xs, np.float32)
    buf = pack_vector_wire(v)
    assert len(buf) == 4 + 4 * len(v)
    assert buf[:2] == len(v).to_bytes(2, "big")
    back = unpack_vector_wire(buf)
    # bit-exact comparison (== would fail on NaN)
    assert back.tobytes() == v.tobytes()


@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 5),
    st.integers(0, 60),
)
@settings(max_examples=25, deadline=None)
def test_image_ahash_brightness_invariance(seed, scale, offset):
    """The defining aHash property: a positive affine brightness change
    (pixels → a·x + b) preserves every cell-vs-mean comparison, so the
    64-bit hash is identical — recompressed/re-exposed copies of an image
    fingerprint to the same value."""
    import numpy as np

    from vectorchord_spark.pipeline.multimodal import _ahash64

    rng = np.random.default_rng(seed)
    grad = np.tile((np.arange(24) * 9).astype(np.float64), (24, 1))
    base = grad + rng.uniform(0, 10, (24, 24))
    px = np.stack([base] * 3, axis=2)
    transformed = np.clip(px * scale + offset, 0, 10_000)
    a = _ahash64(px.astype(np.float64))
    b = _ahash64(transformed.astype(np.float64))
    assert a == b


@given(st.integers(0, 2**32 - 1), st.sampled_from([2, 3, 5, 9]))
@settings(max_examples=25, deadline=None)
def test_audio_fingerprint_gain_invariance(seed, gain):
    """The audio fingerprint thresholds window energy against the clip
    mean, so a pure gain change (volume) leaves the hash bit-identical —
    re-normalized copies of a clip fingerprint to the same value. Also:
    a clip must not hash to 0 unless it is flat."""
    import numpy as np

    from vectorchord_spark.pipeline.multimodal import _envelope_fp64

    rng = np.random.default_rng(seed)
    env = np.abs(rng.standard_normal(64)) + 0.1
    pcm = (np.repeat(env, 100) * 3000).astype("<i2")
    a = _envelope_fp64(pcm)
    b = _envelope_fp64((pcm.astype(np.int64) * gain).astype(np.int64))
    assert a == b
    assert a != 0
    assert _envelope_fp64(np.full(640, 1234, "<i2")) == 0  # flat clip
