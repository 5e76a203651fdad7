"""WebDataset-style shard sink (pipelines/sinks.write_wds_shards)."""

import json
import os
import tarfile

import numpy as np
import pandas as pd

from bano_ray.pipelines.sinks import write_wds_shards

SF = "/root/testdata/sf0.001"


def _index(ds):
    return ds.to_pandas().sort_values("shard_id").reset_index(drop=True)


class TestWdsSink:
    def test_index_and_content(self, ray_session, tmp_path):
        from bano_ray import datagen
        from bano_ray.codecs import decode_image

        out = str(tmp_path / "wds")
        idx = _index(write_wds_shards(SF, out))
        assert idx["n_samples"].sum() == 500
        assert (idx["shard_name"] ==
                ["shard-%06d.tar" % s for s in idx["shard_id"]]).all()
        with tarfile.open(os.path.join(out, idx["shard_name"][0])) as tar:
            names = tar.getnames()
            # pairs: one payload + one json per sample
            assert len(names) == 2 * idx["n_samples"][0]
            meta = json.loads(tar.extractfile("img00000001.json").read())
            d = np.array([1], dtype=np.int64)
            w, h = datagen.dims_of(d)
            assert (meta["w"], meta["h"]) == (int(w[0]), int(h[0]))
            assert meta["caption"] == str(datagen.caption_of(d)[0])
            fmt = meta["fmt"]
            blob = tar.extractfile(f"img00000001.{fmt}").read()
            px = decode_image(blob, fmt)
            want = datagen.pixels_of(1, int(w[0]), int(h[0]))
            if fmt == "png":
                assert np.array_equal(px, want)
            else:
                assert px.shape == want.shape

    def test_byte_deterministic(self, ray_session, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_wds_shards(SF, a).materialize()
        write_wds_shards(SF, b).materialize()
        for f in sorted(os.listdir(a)):
            with open(os.path.join(a, f), "rb") as fa, \
                 open(os.path.join(b, f), "rb") as fb:
                assert fa.read() == fb.read(), f

    def test_resume_skips_existing(self, ray_session, tmp_path):
        out = str(tmp_path / "wds")
        idx1 = _index(write_wds_shards(SF, out))
        victim = os.path.join(out, idx1["shard_name"][2])
        mtimes = {f: os.path.getmtime(os.path.join(out, f))
                  for f in os.listdir(out)}
        os.remove(victim)
        idx2 = _index(write_wds_shards(SF, out))
        pd.testing.assert_frame_equal(idx1, idx2)
        assert os.path.exists(victim)  # rebuilt
        for f, m in mtimes.items():
            if os.path.join(out, f) != victim:
                assert os.path.getmtime(os.path.join(out, f)) == m, f
