"""Multimodal plumbing: schemas, actor-pool stages, frame explosion.

Decode is stubbed (no image/audio libs in this container); the Ray-side
contract — actor init-once, per-batch Arrow in/out, row explosion — is
real and tested here."""

import numpy as np
import pyarrow as pa
import ray.data

from engine.multimodal import (ASSETS, synth_assets, ImageFeatureActor,
                               FrameSampleActor)


def test_synth_schema():
    t = synth_assets(50)
    assert t.schema.equals(ASSETS)
    assert t.num_rows == 50
    assert synth_assets(50).equals(t)  # deterministic


def test_image_actor_pool():
    ds = ray.data.from_arrow(synth_assets(60))
    out = ds.map_batches(ImageFeatureActor, batch_format="pyarrow",
                         batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 60
    assert out["decode_ok"].all()
    assert all(len(f) == ImageFeatureActor.FEAT_DIM for f in out["feature"])
    # determinism: same payload -> same feature regardless of actor
    out2 = ds.map_batches(ImageFeatureActor, batch_format="pyarrow",
                          batch_size=32, concurrency=1).to_pandas()
    a = out.sort_values("asset_id")["feature"].tolist()
    b = out2.sort_values("asset_id")["feature"].tolist()
    assert np.allclose(np.array(a, dtype=float), np.array(b, dtype=float))


def test_image_actor_error_column():
    t = pa.table({
        "asset_id": pa.array([1], pa.int64()),
        "payload": pa.array([b""], pa.binary()),
    })
    out = ImageFeatureActor()(t).to_pylist()[0]
    assert out["decode_ok"] is False   # error recorded, not silently dropped


def test_frame_explosion():
    ds = ray.data.from_arrow(synth_assets(30))
    out = ds.map_batches(FrameSampleActor, batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    src = synth_assets(30).to_pandas()
    vids = src[src["duration_ms"] > 0]
    expected = int(sum(np.ceil(vids["duration_ms"] / 250)))
    assert len(out) == expected
    g = out.groupby("asset_id")["frame_index"].agg(["min", "max", "count"])
    assert (g["min"] == 0).all()
    assert (g["count"] == g["max"] + 1).all()


def test_audio_segment_actor(ray_session):
    """Segment explosion with the reference's start/end layout: audio
    assets only, contiguous 400ms windows, deterministic stub text."""
    import pyarrow as pa
    import ray.data
    from engine.multimodal import AudioSegmentActor, synth_assets

    assets = synth_assets(60, seed=5)
    out = (ray.data.from_arrow(assets)
           .map_batches(AudioSegmentActor, batch_format="pyarrow",
                        batch_size=16, concurrency=2)
           .to_pandas().sort_values(["asset_id", "segment"])
           .reset_index(drop=True))
    kinds = dict(zip(assets.column("asset_id").to_pylist(),
                     assets.column("kind").to_pylist()))
    durs = dict(zip(assets.column("asset_id").to_pylist(),
                    assets.column("duration_ms").to_pylist()))
    assert len(out) > 0
    assert all(kinds[a] == "audio" for a in out["asset_id"])
    for aid, g in out.groupby("asset_id"):
        # contiguous coverage [0, dur]
        assert list(g["segment"]) == list(range(len(g)))
        assert g["start"].iloc[0] == 0.0
        assert abs(g["end"].iloc[-1] - durs[aid] / 1000.0) < 1e-9
        assert (g["end"].to_numpy()[:-1] == g["start"].to_numpy()[1:]).all()
    assert out["decode_ok"].all()
    assert (out["text"].str.len() > 0).all()
    # determinism across parallelism
    out2 = (ray.data.from_arrow(assets).repartition(5)
            .map_batches(AudioSegmentActor, batch_format="pyarrow",
                         batch_size=16, concurrency=2)
            .to_pandas().sort_values(["asset_id", "segment"])
            .reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(out, out2)
