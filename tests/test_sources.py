"""Binary flow source + formatter (reference S4/S5) and CLI smoke."""

import numpy as np
import pyarrow as pa


def test_format_flow_keys():
    from hksketch.sources.flows import format_flow_keys

    key = bytes([10, 0, 0, 1, 0x1F, 0x90, 192, 168, 1, 2, 0x00, 80, 6])
    out = format_flow_keys(pa.array([key], type=pa.binary())).to_pylist()
    assert out == ["6 10.0.0.1:8080 -> 192.168.1.2:80"]


def test_read_flow_records(ray_session, tmp_path):
    from hksketch.sources.flows import read_flow_records

    rng = np.random.default_rng(0)
    recs = rng.integers(0, 256, size=(1000, 13), dtype=np.uint8)
    p = tmp_path / "0.dat"
    p.write_bytes(recs.tobytes())
    ds = read_flow_records(str(p))
    rows = ds.take_all()
    assert len(rows) == 1000
    assert rows[0]["flow"] == recs[0].tobytes()
    assert all(len(r["flow"]) == 13 for r in rows[:20])


def test_wordcount_cli(ray_session, tmp_path, capsys):
    from hksketch.cli import main

    f = tmp_path / "t.txt"
    f.write_text("apple apple banana\napple cherry\n" * 50)
    assert main(["wordcount", str(f), "-k", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["apple 150", "banana 50"] or out == ["apple 150", "cherry 50"]
