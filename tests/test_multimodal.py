from __future__ import annotations

import pyarrow as pa


def _binary_ds(ray_session):
    import ray.data as rd

    from invertedindexbuilder_ray.corpus import make_webpages

    tbl = make_webpages(50)
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array(range(50), pa.int64()),
                "payload": tbl["html"],  # the fixture's binary column
            }
        )
    )


def test_decode_stub_deterministic(ray_session):
    from invertedindexbuilder_ray.stages.multimodal import decode_images

    ds = _binary_ds(ray_session)
    a = decode_images(ds).to_pandas().sort_values("id").reset_index(drop=True)
    b = decode_images(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["channels"] == 3).all()
    assert a["height"].between(64, 255).all()
    assert (a["decoder"] == "stub").all()


def test_byte_histogram_features(ray_session):
    import numpy as np

    from invertedindexbuilder_ray.stages.multimodal import IMAGE_FEATURE_DIM, image_features

    ds = _binary_ds(ray_session)
    out = image_features(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 50
    f0 = np.asarray(out.loc[0, "feature"], dtype=np.float32)
    assert len(f0) == IMAGE_FEATURE_DIM
    assert abs(f0.sum() - 1.0) < 1e-5  # normalized histogram
