"""Pure-host logic of the driver bench harness (bench.py): the result
classification, compact-line, and learned-wall helpers that decide what
``bench.py all`` runs and what the driver's ~2 KB output tail captures.
These guard the bench->driver contract (VERDICT r3 item 1) without
touching a device."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_is_real_metric_accepts_measurements():
    assert bench._is_real_metric(
        {"metric": "whisper_large-v3_rtf", "value": 0.027, "unit": "rtf",
         "vs_baseline": 1.8})


def test_is_real_metric_rejects_failure_shapes():
    # in-process failure: main() catches, exits rc=0 with *_bench_failed
    assert not bench._is_real_metric(
        {"metric": "tts_bench_failed", "value": -1.0, "unit": "error",
         "vs_baseline": 0.0, "detail": {"error": "boom"}})
    # subprocess-level error raised in bench_all
    assert not bench._is_real_metric(
        {"metric": "tts", "value": -1.0, "unit": "error",
         "vs_baseline": 0.0, "error": "TimeoutExpired"})
    # budget skip
    assert not bench._is_real_metric(
        {"metric": "vad", "value": -1.0, "unit": "skipped",
         "vs_baseline": 0.0})


def test_compact_line_fits_tail_and_parses():
    r = {"metric": "m" * 60, "value": 1.23456, "unit": "rtf",
         "vs_baseline": 2.0,
         "detail": {("k%d" % i): float(i) for i in range(200)}}
    line = bench._compact_line(r, max_bytes=600)
    assert len(line.encode()) <= 600
    parsed = json.loads(line)
    assert parsed["value"] == 1.23456


def test_walls_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_WALLS_PATH",
                        str(tmp_path / "cache" / "walls.json"))
    assert bench._load_walls() == {}
    walls = {}
    bench._save_wall(walls, "tts", 123.456)
    assert bench._load_walls() == {"tts": 123.5}
    bench._save_wall(walls, "tts", 60.0)       # later run overwrites
    assert bench._load_walls() == {"tts": 60.0}


def test_all_modes_cover_readme_rows():
    """Every north-star family has a mode, the primary is the whisper
    headline, and fused modes precede the two lowest-value rows so a
    budget squeeze sacrifices those first."""
    names = [name for name, _, _ in bench._ALL_MODES]
    assert names[0] == "whisper_kv8d_w8_w8e"
    for required in ("tts", "dfn", "lid", "serve_stt", "serve_qwen3",
                     "qwen3tts", "vad", "parakeet", "whisper_fused",
                     "tts_fused"):
        assert required in names, required
    assert names.index("whisper_fused") < names.index("whisper_longfile")
    assert names.index("tts_fused") < names.index("whisper_bf16")


def test_record_standalone_wall(tmp_path, monkeypatch):
    """A standalone `python bench.py <argv>` run whose argv matches an
    _ALL_MODES entry records a learned wall (so a budget-skipped mode —
    e.g. the fused kernels — becomes schedulable once it has ever run on
    this machine); non-mode argvs record nothing."""
    monkeypatch.setattr(bench, "_WALLS_PATH",
                        str(tmp_path / "cache" / "walls.json"))
    assert bench._record_standalone_wall(["large-v3", "fused", "w8e"],
                                         412.0)
    assert bench._load_walls() == {"whisper_fused": 412.0}
    # an ad-hoc variant that is NOT a scheduled mode must not pollute
    assert not bench._record_standalone_wall(["large-v3", "kv8"], 50.0)
    assert bench._load_walls() == {"whisper_fused": 412.0}
