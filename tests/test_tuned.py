"""TUNED.json kernel-default mechanism (scripts/autotune_r3.py writes it,
ops/fused.py reads it; precedence env > TUNED.json > off)."""

import json

from muscato_tpu.ops import fused


def test_load_tuned_missing(monkeypatch, tmp_path):
    monkeypatch.setenv("MUSCATO_TUNED", str(tmp_path / "absent.json"))
    assert fused._load_tuned() == {}


def test_load_tuned_reads_flags(monkeypatch, tmp_path):
    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({
        "flags": {"MUSCATO_MGATHER": 1, "MUSCATO_DORDER": 0},
        "provenance": {"winner": "mg"},
    }))
    monkeypatch.setenv("MUSCATO_TUNED", str(p))
    assert fused._load_tuned() == {"MUSCATO_MGATHER": 1, "MUSCATO_DORDER": 0}


def test_load_tuned_corrupt_is_off(monkeypatch, tmp_path):
    p = tmp_path / "TUNED.json"
    p.write_text("{not json")
    monkeypatch.setenv("MUSCATO_TUNED", str(p))
    assert fused._load_tuned() == {}


def test_flag_precedence(monkeypatch):
    monkeypatch.setattr(fused, "_TUNED", {"MUSCATO_MGATHER": 1})
    monkeypatch.delenv("MUSCATO_MGATHER", raising=False)
    assert fused._flag("MUSCATO_MGATHER") is True          # tuned beats default
    monkeypatch.setenv("MUSCATO_MGATHER", "0")
    assert fused._flag("MUSCATO_MGATHER") is False         # env beats tuned
    monkeypatch.setattr(fused, "_TUNED", {})
    monkeypatch.delenv("MUSCATO_MGATHER", raising=False)
    assert fused._flag("MUSCATO_MGATHER") is False         # hard default: off


def test_effective_flags_shape():
    f = fused.effective_flags()
    base = {"MUSCATO_MGATHER", "MUSCATO_PJOIN", "MUSCATO_DORDER",
            "MUSCATO_PEXPAND"}
    extra = {"MUSCATO_MG_SPOS", "MUSCATO_MG_ROWS", "MUSCATO_MG_KEYS"}
    assert base <= set(f) <= base | extra
    # Stream sub-flags appear exactly when the gather kernel is on.
    assert ("MUSCATO_MG_SPOS" in f) == bool(f["MUSCATO_MGATHER"])
    assert all(v in (0, 1) for v in f.values())


def test_bench_fallback_carries_tuned_provenance(monkeypatch, tmp_path):
    """A relay-down fallback bench record must cite the last measured
    chip number from TUNED.json (round-3 VERDICT next #2)."""
    import json

    from muscato_tpu.bench import runner

    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({
        "flags": {"MUSCATO_DORDER": 1},
        "provenance": {
            "winner": "do", "reads_per_sec_chip": 1234567.0,
            "device_kind": "TPU v5 lite", "date": "2026-08-19",
        },
    }))
    monkeypatch.setenv("MUSCATO_TUNED", str(p))
    prov = runner._tuned_provenance()
    assert prov["reads_per_sec_chip"] == 1234567.0
    assert prov["flags"] == {"MUSCATO_DORDER": 1}
    assert "not this run" in prov["source"]

    # No measured number -> no provenance block (never fabricate).
    p.write_text(json.dumps({"flags": {}, "provenance": {}}))
    assert runner._tuned_provenance() is None
