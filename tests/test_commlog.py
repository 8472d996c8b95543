"""Collective accounting (utils/commlog.py) + ICI scaling model
(parallel/ici_model.py): the VERDICT-r2 scaling-evidence artifact."""

import numpy as np
import pytest

import hdk_tpu
from hdk_tpu.utils import commlog


def test_capture_records_dist_shuffle(rng):
    """A dist high-NDV group-by with shuffle routes records its
    all_to_all bytes at trace time."""
    hdk = hdk_tpu.HDK(**{"dist.enable": True, "dist.num_devices": 4})
    n = 40_000
    hdk.import_pydict({
        "k": rng.integers(0, n, n),   # high NDV -> shuffle route
        "v": rng.integers(0, 50, n),
    }, name="cl_t")
    t = hdk.scan("cl_t")
    with commlog.capture() as records:
        t.agg("k", "median(v)").run().block()  # holistic -> raw shuffle
    s = commlog.summarize(records, 4)
    assert s["n_collectives"] >= 1
    assert s["bytes_per_device_by_op"].get("all_to_all", 0) > 0
    assert s["wire_bytes_per_device"] > 0


def test_summarize_wire_model():
    recs = [
        {"op": "all_to_all", "axis": "frag", "bytes_per_device": 800},
        {"op": "psum", "axis": "frag", "bytes_per_device": 100},
        {"op": "all_gather", "axis": "frag", "bytes_per_device": 10},
    ]
    s = commlog.summarize(recs, 4)
    assert s["n_collectives"] == 3
    # a2a: 800*3/4=600; psum: 2*100*3/4=150; ag: 10*3=30
    assert s["wire_bytes_per_device"] == 600 + 150 + 30


def test_ici_model_prediction():
    from hdk_tpu.parallel.ici_model import IciModel

    m = IciModel(ici_bytes_per_sec=200e9, alpha_per_collective=5e-6)
    # compute-dominated query: near-perfect predicted efficiency
    recs = [{"op": "all_to_all", "axis": "frag", "bytes_per_device": 1 << 20}]
    p = m.predict(1.0, recs, 8)
    assert p["predicted_efficiency"] > 0.99
    # wire-dominated: tiny compute, huge payload -> low efficiency
    recs = [{"op": "all_to_all", "axis": "frag",
             "bytes_per_device": 10 << 30}]
    p2 = m.predict(0.01, recs, 8)
    assert p2["predicted_efficiency"] < 0.1
    assert p2["t_wire_s"] > p2["t_compute_s"]


def test_capture_empty_without_dist(rng):
    hdk = hdk_tpu.HDK()
    hdk.import_pydict({"k": rng.integers(0, 5, 100)}, name="cl_l")
    with commlog.capture() as records:
        hdk.scan("cl_l").agg("k", "count").run().block()
    assert records == []
