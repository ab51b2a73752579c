"""Smoke-test bench.py and full_eval end-to-end at tiny scale on CPU:
the driver runs bench.py unattended on real hardware, so its plumbing
(data gen, ground truth, ef ladder, JSON contract) must never break."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract(capsys, monkeypatch):
    monkeypatch.setenv("DVT_BENCH_N", "3000")
    monkeypatch.setenv("DVT_BENCH_Q", "256")
    monkeypatch.setenv("DVT_BENCH_BUILD_BATCH", "256")
    bench = _load(os.path.join(REPO, "bench.py"), "bench_smoke")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    for key in ("metric", "value", "unit", "vs_baseline", "recall_at_10",
                "ef_search", "build_vectors_per_s"):
        assert key in payload, key
    assert payload["unit"] == "qps"
    assert payload["value"] > 0
    assert 0.0 <= payload["recall_at_10"] <= 1.0
    # tiny clustered instances are easy: recall must be high
    assert payload["recall_at_10"] >= 0.9
