"""The IE-pipeline runner: stage plans render the documented docker
commands; unknown stages are rejected; dry-run never executes anything."""

import subprocess
import sys
import os

from clip_event_tpu.preprocess.ie_pipeline import STAGES, plan, run


def test_plan_renders_documented_commands(tmp_path):
    plans = plan(str(tmp_path))
    assert set(plans) == {"setup", "text-ie", "vision-ie"}
    text_cmds = plans["text-ie"]
    # OneIE extraction command shape (pipeline_full_en.sh:149-151)
    oneie = text_cmds[0]
    assert "limteng/oneie_aida_m36" in oneie and "/oneie/predict.py" in oneie
    assert f"{tmp_path}/ltf" in oneie
    # tab2cs produces the ColdStart contract (pipeline_full_en.sh:175-177)
    assert any("tab2cs.py" in " ".join(c) for c in text_cmds)
    assert any("yrf1/object-detection" in c for c in plans["vision-ie"][0])


def test_plan_unknown_stage_rejected(tmp_path):
    try:
        plan(str(tmp_path), stages=["bogus"])
    except ValueError as e:
        assert "bogus" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_dry_run_executes_nothing(tmp_path):
    # dry run must succeed on a docker-less host and leave the dir untouched
    assert run(str(tmp_path), dry_run=True)
    assert os.listdir(tmp_path) == []


def test_cli_plan(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "run_ie_pipeline.py", "--data-root", str(tmp_path),
         "--plan", "--stages", "text-ie"],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout + proc.stderr
    assert "DRY-RUN" in out and "oneie" in out
    assert "preprocess_descriptions.py" in out
    assert [s.name for s in STAGES] == ["setup", "text-ie", "vision-ie"]
