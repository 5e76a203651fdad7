"""Int8 scalar quantization (stages/quantize.py): code range, round-trip
error bound, and degenerate-dimension handling."""
import numpy as np
import pyarrow as pa

from bano_ray.stages.quantize import LEVELS, _encode_fn, _minmax_partial


class _FakeRef:
    pass


def _encode_local(m: np.ndarray, mn: np.ndarray, mx: np.ndarray):
    import bano_ray.stages.quantize as qz

    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array(list(m.astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    fn = _encode_fn(_FakeRef())
    # bypass ray.get by monkeypatching within the closure call path
    import ray
    orig = ray.get
    ray.get = lambda r: (mn, mx) if isinstance(r, _FakeRef) else orig(r)
    try:
        return fn(tbl)
    finally:
        ray.get = orig


def test_codes_bounded_and_roundtrip():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(200, 8)).astype(np.float32).astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    out = _encode_local(m, mn, mx)
    # reconstruct codes from the exact summaries is not possible; re-derive
    # codes directly and check the published summaries agree
    span = mx - mn
    codes = np.floor((m - mn) * float(LEVELS) / span + 0.5)
    assert codes.min() >= 0 and codes.max() <= LEVELS
    assert (out.column("code_sum").to_numpy()
            == codes.sum(axis=1).astype(np.int64)).all()
    # dequantized error bounded by half a step per dimension
    recon = mn + codes * span / float(LEVELS)
    assert (np.abs(recon - m) <= span / (2 * LEVELS) + 1e-12).all()


def test_degenerate_dimension_codes_zero():
    m = np.ones((5, 3), dtype=np.float64)
    m[:, 1] = np.arange(5)
    mn, mx = m.min(axis=0), m.max(axis=0)
    out = _encode_local(m, mn, mx)
    # dims 0 and 2 are constant → contribute 0 to every summary
    codes1 = np.floor((m[:, 1] - mn[1]) * float(LEVELS)
                      / (mx[1] - mn[1]) + 0.5).astype(np.int64)
    assert (out.column("code_sum").to_numpy() == codes1).all()


def test_minmax_partial_shape():
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    tbl = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(list(m), pa.list_(pa.float32()))})
    out = _minmax_partial(tbl)
    assert out.num_rows == 4
    assert (out.column("mn").to_numpy() == [0, 1, 2, 3]).all()
    assert (out.column("mx").to_numpy() == [8, 9, 10, 11]).all()
