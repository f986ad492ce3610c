"""Output-format fidelity: the printed table must be byte-compatible with
the reference's iostream formatting (ver0/GSimulation.cpp:176-234)."""

import math
import os

from nbody_tpu.utils import reporting
from nbody_tpu.utils.flops import step_gflops


def _golden_lines(golden_dir, name):
    with open(os.path.join(golden_dir, name)) as f:
        return f.read().splitlines()


def test_header_bytes(golden_dir):
    lines = _golden_lines(golden_dir, "ver0_n2000_s500.txt")
    got = (reporting.banner() + "\n" + reporting.header(2000, 500, 0.1)).splitlines()
    assert got == lines[: len(got)]


def test_stats_row_columns(golden_dir):
    # Re-render the golden rows from their parsed values; the s/dt/kenergy
    # columns must reproduce byte-for-byte (time/GFlops differ per run).
    lines = _golden_lines(golden_dir, "ver0_n2000_s500.txt")
    rows = [l for l in lines if l.startswith(" ") and l[1].isdigit()]
    assert len(rows) == 10
    for row in rows:
        s = int(row[1:9])
        ke = float(row[17:29])
        t = float(row[29:41])
        gf = float(row[41:])
        got = reporting.stats_row(s, s * 0.1, ke, t, gf)
        assert got[:29] == row[:29]


def test_footer_shape(golden_dir):
    lines = _golden_lines(golden_dir, "ver0_n2000_s500.txt")
    got = reporting.footer(1, 16.282, 3.5547, 0.053287).splitlines()
    # golden footer = last 5 lines (incl. leading blank)
    assert got == lines[-5:]


def test_nan_renders_like_cpp(golden_dir):
    # With <3 sample blocks the reference prints "-nan" (see
    # ver0_n256_s100.txt); C++ iostreams render NaN that way.
    lines = _golden_lines(golden_dir, "ver0_n256_s100.txt")
    got = reporting.footer(1, 0.054183, float("nan"), float("nan")).splitlines()
    assert got[-2] == lines[-2] == "# Average Perfomance : -nan +- -nan"


def test_g5_matches_cpp_setprecision5():
    cases = {
        103.29: "103.29",
        2666.5: "2666.5",
        0.1432: "0.1432",
        5.0: "5",
        1105700.0: "1.1057e+06",
        0.015729: "0.015729",
    }
    for v, s in cases.items():
        assert reporting._g5(v) == s
    assert reporting._g5(float("nan")) == "-nan"


def test_flops_model():
    # flops/step = 29 N^2 + 19 N (ver0/GSimulation.cpp:122)
    assert step_gflops(2000) == 1e-9 * (29 * 2000**2 + 19 * 2000)
    assert not math.isnan(step_gflops(1))


def test_parse_trace_inverts_stats_row():
    from nbody_tpu.utils.reporting import header, parse_trace, stats_row

    text = "\n".join(
        [header(2000, 500, 0.1),
         stats_row(50, 5.0, 0.1432, 0.04, 134.4),
         stats_row(100, 10.0, 2.4341, 0.03, 164.0),
         "# Number Threads     : 1"]
    )
    assert parse_trace(text) == [(50, "0.1432"), (100, "2.4341")]
