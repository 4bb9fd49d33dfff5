"""The package must be pip-installable (pyproject.toml) with its BPE asset.

The reference ships as a bare source tree; installability is part of the
"switch to this framework" contract.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_prefix_and_import(tmp_path):
    # Build from a copy: pip's in-tree build would otherwise litter the
    # repo root with build/ + *.egg-info duplicates of the package.
    src = tmp_path / "src"
    src.mkdir()
    shutil.copytree(
        os.path.join(REPO, "clip_event_tpu"), src / "clip_event_tpu",
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    for name in ("pyproject.toml", "README.md"):
        shutil.copy(os.path.join(REPO, name), src / name)

    prefix = str(tmp_path / "prefix")
    proc = subprocess.run(
        [
            sys.executable, "-m", "pip", "install",
            "--no-deps", "--no-build-isolation", "--quiet",
            "--prefix", prefix, str(src),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr

    site = os.path.join(
        prefix, "lib", f"python{sys.version_info.major}.{sys.version_info.minor}",
        "site-packages",
    )
    check = (
        "import sys; sys.path.insert(0, %r); "
        "import clip_event_tpu; "
        "assert not clip_event_tpu.__file__.startswith(%r), clip_event_tpu.__file__; "
        "from clip_event_tpu.tokenizer import tokenize; "
        "out = tokenize(['a photo of a dog']); "
        "assert out.shape == (1, 77)"
    ) % (site, REPO)
    proc = subprocess.run(
        [sys.executable, "-c", check],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),  # not the repo root — imports must hit the install
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr
