"""Header-parse metadata extraction (stages/imagemeta.py)."""

import numpy as np
import pyarrow as pa
import pytest

from bano_ray.codecs.jpeg import encode_jpeg
from bano_ray.codecs.png import encode_png
from bano_ray.stages.imagemeta import _jpeg_dims, image_dims_batch


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestJpegDims:
    def test_walks_markers(self):
        for w, h in [(12, 20), (16, 16), (31, 13)]:
            blob = encode_jpeg(_img(w, h, seed=w * h))
            assert _jpeg_dims(memoryview(blob)) == (w, h)

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            _jpeg_dims(memoryview(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30))


class TestImageDimsBatch:
    def test_mixed_formats(self):
        dims = [(12, 20), (16, 16), (13, 17), (20, 12)]
        blobs, fmts = [], []
        for i, (w, h) in enumerate(dims):
            if i % 2:
                blobs.append(encode_jpeg(_img(w, h, seed=i)))
                fmts.append("jpeg")
            else:
                blobs.append(encode_png(_img(w, h, seed=i)))
                fmts.append("png")
        batch = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                          "bytes": pa.array(blobs, pa.binary())})
        out = image_dims_batch(batch).to_pandas()
        assert out["fmt_parsed"].tolist() == fmts
        assert list(zip(out["width"], out["height"])) == dims

    def test_sliced_column_offsets(self):
        # a sliced Arrow table must still parse (non-zero col.offset)
        blobs = [encode_png(_img(12 + i, 14, seed=i)) for i in range(6)]
        batch = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                          "bytes": pa.array(blobs, pa.binary())}).slice(2, 3)
        out = image_dims_batch(batch).to_pandas()
        assert out["width"].tolist() == [14, 15, 16]
        assert out["height"].tolist() == [14, 14, 14]

    def test_short_blob_raises(self):
        batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                          "bytes": pa.array([b"tiny"], pa.binary())})
        with pytest.raises(ValueError):
            image_dims_batch(batch)
