"""split_autoflow: per-table sampling with exact global ratio via carryover."""

from pathlib import Path

import pytest

from ptlflow_tpu.data.split_autoflow import main, split_autoflow


@pytest.fixture()
def autoflow_root(tmp_path):
    # 4 parts x 10 tables x 10 samples = 400 samples, names "t_<table>_s_<i>"
    n = 0
    for part in range(4):
        pdir = tmp_path / f"static_40k_png_{part + 1}_of_4"
        for t in range(part * 3, part * 3 + 3):
            for i in range(10):
                (pdir / f"t_{t}_s_{i}").mkdir(parents=True)
                n += 1
    return tmp_path, n


def test_split_autoflow_ratio_and_determinism(autoflow_root):
    root, total = autoflow_root
    val = split_autoflow(str(root), val_percentage=0.1, expected_total=total)
    assert len(val) == int(0.1 * total)
    assert val == sorted(
        val, key=lambda x: 1000 * int(x.split("_")[1]) + int(x.split("_")[-1]))
    assert val == split_autoflow(str(root), 0.1, total)  # deterministic
    with pytest.raises(ValueError):
        split_autoflow(str(root), 0.1, expected_total=total + 1)


def test_split_autoflow_cli(autoflow_root, tmp_path):
    root, total = autoflow_root
    out = tmp_path / "val.txt"
    main(["--autoflow_root", str(root), "--output_file", str(out),
          "--val_percentage", "0.1", "--expected_total", str(total)])
    lines = out.read_text().splitlines()
    assert len(lines) == int(0.1 * total)
