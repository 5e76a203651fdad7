"""ViT patch statistics (pipelines/flagship.ImagePatches): decode-path
sums must equal direct pixel-field sums; JPEG rows are excluded."""
import numpy as np
import pyarrow as pa

from bano_ray import datagen
from bano_ray.codecs import encode_png
from bano_ray.pipelines.flagship import PATCH, ImagePatches


def _ref_patches(doc_id: int):
    w, h = datagen.dims_of(np.array([doc_id]))
    w, h = int(w[0]), int(h[0])
    px = datagen.pixels_of(doc_id, w, h).astype(np.int64)
    npx = (w + PATCH - 1) // PATCH
    npy = (h + PATCH - 1) // PATCH
    out = {}
    for py in range(npy):
        for pxi in range(npx):
            blk = px[py * PATCH:(py + 1) * PATCH,
                     pxi * PATCH:(pxi + 1) * PATCH]
            out[(py, pxi)] = (int(blk.sum()),
                              blk.shape[0] * blk.shape[1])
    return w, h, out


def test_patch_sums_match_pixel_field():
    ids = [1, 2, 3, 5, 9, 42]  # non-multiples of FMT_JPEG_MOD → png
    blobs, fmts = [], []
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        blobs.append(encode_png(datagen.pixels_of(d, int(w[0]), int(h[0]))))
        fmts.append("png")
    batch = pa.table({
        "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        "fmt": pa.array(fmts),
        "bytes": pa.array(blobs, pa.binary()),
    })
    got = ImagePatches()(batch).to_pandas()
    for d in ids:
        _, _, ref = _ref_patches(d)
        sub = got[got["doc_id"] == d]
        assert len(sub) == len(ref)
        for r in sub.itertuples():
            ps, n = ref[(r.patch_y, r.patch_x)]
            assert (r.psum, r.n_px) == (ps, n)


def test_pipeline_excludes_jpeg(ray_session, sf_dir):
    from bano_ray.pipelines.flagship import image_patches

    df = image_patches(sf_dir).to_pandas()
    assert (df["doc_id"].to_numpy() % datagen.FMT_JPEG_MOD != 0).all()
    assert (df["n_px"] > 0).all() and (df["psum"] >= 0).all()


def test_scene_cuts_match_pixel_field():
    from bano_ray.pipelines.flagship import (FRAME_H, FRAME_W,
                                             FRAMES_PER_VIDEO, SCENE_CUT_T,
                                             SceneCuts, make_video_payload)

    ids = [0, 7, 123]
    batch = pa.table({
        "video_id": pa.array(np.array(ids, np.int64)),
        "n_frames": pa.array(np.full(len(ids), FRAMES_PER_VIDEO, np.int32)),
        "bytes": pa.array([make_video_payload(v) for v in ids], pa.binary()),
    })
    got = SceneCuts()(batch).to_pandas().set_index("video_id")
    for v in ids:
        lums = [int(datagen.pixels_of(v * FRAMES_PER_VIDEO + i,
                                      FRAME_W, FRAME_H)
                    .astype(np.int64).sum())
                for i in range(FRAMES_PER_VIDEO)]
        jumps = np.abs(np.diff(lums))
        assert got.loc[v, "n_cuts"] == int((jumps > SCENE_CUT_T).sum())
        assert got.loc[v, "max_jump"] == int(jumps.max())


def test_dhash_matches_pixel_field():
    from bano_ray.pipelines.flagship import ImageDhash
    from bano_ray.codecs import encode_png

    ids = [1, 2, 17, 33]
    blobs = []
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        blobs.append(encode_png(datagen.pixels_of(d, int(w[0]), int(h[0]))))
    batch = pa.table({
        "doc_id": pa.array(np.array(ids, np.int64)),
        "fmt": pa.array(["png"] * len(ids)),
        "bytes": pa.array(blobs, pa.binary()),
    })
    got = ImageDhash()(batch).to_pandas().set_index("doc_id")["dhash"]
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        px = datagen.pixels_of(d, int(w[0]), int(h[0]))
        assert got[d] == ImageDhash.dhash_of(px)
    # hashes differ across independently-fielded images
    assert len(set(got)) == len(ids)


def _png_batch(ids):
    blobs = []
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        blobs.append(encode_png(datagen.pixels_of(d, int(w[0]), int(h[0]))))
    return pa.table({
        "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        "fmt": pa.array(["png"] * len(ids)),
        "bytes": pa.array(blobs, pa.binary()),
    })


def test_image_hist_matches_pixel_field():
    from bano_ray.pipelines.flagship import HIST_BIN_W, ImageHist

    ids = [1, 2, 3, 5, 9, 42]
    got = ImageHist()(_png_batch(ids)).to_pandas()
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        px = datagen.pixels_of(d, int(w[0]), int(h[0])).astype(np.int64)
        lum = px.reshape(-1, 3).sum(axis=1)
        ref = {}
        for v in lum:
            ref[v // HIST_BIN_W] = ref.get(v // HIST_BIN_W, 0) + 1
        sub = got[got["doc_id"] == d]
        assert {(r.bin, r.n) for r in sub.itertuples()} == set(ref.items())
        # histogram is a partition of the pixel grid
        assert sub["n"].sum() == int(w[0]) * int(h[0])


def test_sobel_energy_matches_pixel_field():
    from bano_ray.pipelines.flagship import ImageSobel

    ids = [1, 2, 3, 5, 9, 42]
    got = ImageSobel()(_png_batch(ids)).to_pandas().set_index("doc_id")
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        px = datagen.pixels_of(d, int(w[0]), int(h[0])).astype(np.int64)
        lum = px.sum(axis=2)
        gx = sum(abs(int(lum[y][x + 1]) - int(lum[y][x]))
                 for y in range(lum.shape[0]) for x in range(lum.shape[1] - 1))
        gy = sum(abs(int(lum[y + 1][x]) - int(lum[y][x]))
                 for y in range(lum.shape[0] - 1) for x in range(lum.shape[1]))
        assert (got.loc[d, "gx_energy"], got.loc[d, "gy_energy"]) == (gx, gy)


def test_image_mips_matches_pixel_field():
    from bano_ray.pipelines.flagship import MIP_LEVELS, ImageMips

    ids = [1, 2, 3, 5, 9, 42]
    got = ImageMips()(_png_batch(ids)).to_pandas().set_index(["doc_id", "lvl"])
    for d in ids:
        w, h = datagen.dims_of(np.array([d]))
        w, h = int(w[0]), int(h[0])
        lum = datagen.pixels_of(d, w, h).astype(np.int64).sum(axis=2)
        for lvl in MIP_LEVELS:
            step = 1 << lvl
            cells = {}
            for y in range(h):
                for x in range(w):
                    cells.setdefault((y // step, x // step),
                                     []).append(int(lum[y][x]))
            n_cells = len(cells)
            s_avg = sum(sum(v) // len(v) for v in cells.values())
            assert (got.loc[(d, lvl), "n_cells"],
                    got.loc[(d, lvl), "s_avg"]) == (n_cells, s_avg)
