"""The IE-pipeline runner: the rendered plan must cover EVERY uncommented
`docker` step of the reference scripts (pipeline_full_en.sh, multimedia.sh,
set_up_m36.sh) by image + entrypoint; unknown stages are rejected; dry-run
never executes anything."""

import os
import re
import subprocess
import sys

import pytest

from clip_event_tpu.preprocess.ie_pipeline import (
    STAGES,
    TEXT_IE_STAGES,
    plan,
    run,
)

REF_IE = "/root/reference/src/preprocess/ie"

_VALUED_OPTS = {"-v", "-w", "-p", "--name", "--link", "--gpus", "-e"}
_FLAG_OPTS = {"--rm", "-i", "-d", "-t", "-it", "-di"}
_IMAGE_RE = re.compile(r"^([a-z0-9]+/[a-z0-9_.-]+|mongo)$")


def _reference_docker_steps(path):
    """Parse (image, entrypoint) out of each active `docker run`/`docker pull`
    line of a reference script (joining backslash continuations)."""
    text = open(path).read().replace("\\\n", " ")
    steps = []
    for line in text.splitlines():
        s = line.strip()
        if not s.startswith("docker"):
            continue
        s = s.replace("${eval}", "m36").replace("${lang}", "en")
        toks = s.split()
        if toks[1] == "pull":
            steps.append((toks[2], None))
            continue
        # walk past options to the image token
        i, image = 2, None
        while i < len(toks):
            t = toks[i]
            if t in _VALUED_OPTS:
                i += 2
            elif t in _FLAG_OPTS or t.startswith(("--network", "--gpus=")):
                i += 1
            elif _IMAGE_RE.match(t):
                image = t
                break
            else:
                i += 1
        assert image, f"could not find image in: {s}"
        rest = toks[i + 1:]
        entry = next((t for t in rest if t.endswith((".py", ".sh"))), None)
        if entry is None:
            entry = next(
                (t for t in rest if "StanfordCoreNLP" in t),
                rest[0] if rest else None,
            )
        if entry == "echo":  # progress echoes, not pipeline work
            continue
        steps.append((image, entry))
    return steps


def _flat_plan_commands(tmp_path):
    plans = plan(str(tmp_path))
    return [" ".join(cmd) for cmds in plans.values() for cmd in cmds]


@pytest.mark.parametrize(
    "script", ["pipeline_full_en.sh", "multimedia.sh", "set_up_m36.sh"]
)
def test_plan_covers_every_reference_docker_step(tmp_path, script):
    path = os.path.join(REF_IE, script)
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    ours = _flat_plan_commands(tmp_path)
    missing = []
    for image, entry in _reference_docker_steps(path):
        want = os.path.basename(entry) if entry and "/" in entry else entry
        hit = any(
            image in cmd and (want is None or want in cmd) for cmd in ours
        )
        if not hit:
            missing.append((image, entry))
    assert not missing, f"reference steps not in plan(): {missing}"


def test_plan_renders_documented_commands(tmp_path):
    plans = plan(str(tmp_path))
    assert set(plans) == {s.name for s in STAGES}
    # OneIE extraction command shape (pipeline_full_en.sh:148-150)
    oneie = plans["oneie"][0]
    assert "limteng/oneie_aida_m36" in oneie and "/oneie/predict.py" in oneie
    assert f"{tmp_path}/ltf" in oneie
    # tab2cs produces the ColdStart contract (pipeline_full_en.sh:175-178)
    assert any("tab2cs.py" in " ".join(c) for c in plans["entity"])
    assert any("yrf1/object-detection" in c for c in plans["vision-ie"][0])
    # the final merge writes the full ColdStart file (pipeline_full_en.sh:313-317)
    assert any("pipeline_merge.py" in " ".join(c) for c in plans["merge"])


def test_text_ie_alias_expands_in_order(tmp_path):
    plans = plan(str(tmp_path), stages=["text-ie"])
    assert list(plans) == TEXT_IE_STAGES  # STAGES order == execution order


def test_plan_unknown_stage_rejected(tmp_path):
    with pytest.raises(ValueError, match="bogus"):
        plan(str(tmp_path), stages=["bogus"])


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
    assert [s.name for s in STAGES] == [
        "setup", "preprocess", "oneie", "entity", "fillers", "event",
        "merge", "aif", "vision-ie",
    ]
