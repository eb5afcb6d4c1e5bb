"""bench.py regression-guard parsing: the >5% delta check reads previous
metrics out of the newest driver-captured BENCH_r*.json (whose `tail` field
embeds the bench stdout with escaped newlines/quotes). Format drift must
produce a LOUD warning, not a silent no-op (VERDICT r3 weak #7)."""
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(tmp_path, artifacts):
    """Import bench.py with __file__ pointing into tmp_path so
    _previous_bench scans the temp dir instead of the repo root."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, content in artifacts.items():
        with open(tmp_path / name, "w") as f:
            f.write(content)
    # _previous_bench resolves the scan dir from __file__ (already absolute
    # here, so os.path.abspath passes it through unchanged)
    mod.__file__ = str(tmp_path / "bench.py")
    return mod


def test_previous_bench_parses_driver_artifact(tmp_path):
    """A real driver-shaped artifact (JSON with the bench stdout escaped
    inside "tail") must yield every metric record, with value and the
    optional methodology tag."""
    tail = (
        '# train step 480ms\\n'
        '{\\"metric\\": \\"weakcube_train_step_recipe\\", \\"value\\": 52.05, '
        '\\"unit\\": \\"images/sec/chip\\", \\"vs_baseline\\": 3.54}\\n'
        '{\\"metric\\": \\"weakcube_dla34_fpn_inference_512px\\", '
        '\\"value\\": 362.74, \\"unit\\": \\"images/sec/chip\\", '
        '\\"vs_baseline\\": 30.23, \\"methodology\\": \\"chained\\"}\\n')
    artifact = ('{\n  "n": 3,\n  "rc": 0,\n  "tail": "' + tail + '"\n}\n')
    mod = _load_bench(tmp_path, {"BENCH_r03.json": artifact})
    prev = mod._previous_bench()
    assert prev["weakcube_train_step_recipe"]["value"] == 52.05
    assert prev["weakcube_dla34_fpn_inference_512px"]["methodology"] == \
        "chained"


def test_previous_bench_warns_on_format_drift(tmp_path, capsys):
    """An artifact with no parseable {"metric": ...} lines (driver format
    change) must print the explicit disabled-guard warning."""
    mod = _load_bench(tmp_path, {
        "BENCH_r05.json": json.dumps({"n": 5, "output": "something new"})})
    prev = mod._previous_bench()
    assert prev == {}
    err = capsys.readouterr().err
    assert "WARNING: no previous metrics parsed" in err


def test_previous_bench_picks_newest_round(tmp_path):
    mk = lambda v: ('{"tail": "{\\"metric\\": \\"m\\", \\"value\\": %s}"}'
                    % v)
    mod = _load_bench(tmp_path, {"BENCH_r02.json": mk(1.0),
                                 "BENCH_r10.json": mk(7.5)})
    assert mod._previous_bench()["m"]["value"] == 7.5
