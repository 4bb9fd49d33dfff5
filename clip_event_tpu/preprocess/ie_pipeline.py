"""IE pipeline orchestration: raw VOA corpus → `.cs` / descriptions artifacts.

The reference runs text/vision information extraction as a fleet of docker
images driven by bash (`src/preprocess/ie/pipeline_full_en.sh:149-313`,
`multimedia.sh:1-7`, infra in `set_up_m36.sh:5-23`). SURVEY §2.6 scopes out
re-implementing those models; what this module provides is the *runner* that
takes a user from a raw corpus directory to the artifact contracts the
training data layer consumes:

  <data_root>/merge/cs/entity.cs, event.cs, ...   (ColdStart KEs — parsed by
                                                   `preprocess.ke.load_cs_files`)
  <data_root>/vision/*.pkl                        (object detections — parsed
                                                   by `data.coldstart` / voa)
  descriptions_<pos>_<neg>.json                   (via preprocess_descriptions.py)

Each stage is declared as data (name, docker image, command template,
produced artifacts). `plan()` renders the exact commands; `run()` executes
them with subprocess when docker is available, verifying the expected
artifacts appear. Stages whose docker images are unreachable are reported,
not silently skipped — the corpus contracts are also satisfiable by any
other IE system that emits the same files.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import shutil
import subprocess
from typing import Callable, Dict, List, Optional, Sequence

log = logging.getLogger(__name__)


@dataclasses.dataclass
class Stage:
    name: str
    description: str
    reference: str  # file:line of the reference command being reproduced
    commands: Callable[[Dict[str, str]], List[List[str]]]
    produces: Callable[[Dict[str, str]], List[str]]  # artifact paths


def _dock(image: str, data_root: str, *args: str, gpus: bool = False) -> List[str]:
    cmd = ["docker", "run", "--rm", "-i", "-v", f"{data_root}:{data_root}"]
    if gpus:
        cmd += ["--gpus", "all"]
    return cmd + [image] + list(args)


STAGES: List[Stage] = [
    Stage(
        name="setup",
        description="pull IE docker images + EDL KB + MongoDB services",
        reference="set_up_m36.sh:5-48",
        commands=lambda v: [["docker", "pull", img] for img in (
            "mongo", "panx27/edl", "limanling/uiuc_ie_m36",
            "limteng/oneie_aida_m36", "laituan245/spanbert_entity_coref",
            "laituan245/es_event_coref", "yrf1/object-detection",
            "limanling/grounding-merging",
        )] + [["docker", "run", "-d", "--rm",
               "-v", f"{v['edl_data']}/db:/data/db", "--name", "db", "mongo"]],
        produces=lambda v: [],
    ),
    Stage(
        name="text-ie",
        description="OneIE extraction → fine typing → EDL linking → coref → merged ColdStart",
        reference="pipeline_full_en.sh:149-313",
        commands=lambda v: [
            _dock("limteng/oneie_aida_m36", v["data_root"],
                  "/opt/conda/bin/python", "/oneie/predict.py",
                  "-i", f"{v['data_root']}/ltf", "-o", v["data_root"],
                  "-l", "en", "--output_hidden", gpus=True),
            _dock("limanling/uiuc_ie_m36", v["data_root"],
                  "/opt/conda/envs/py36/bin/python",
                  "/entity/aida_edl/typing.py", "en",
                  f"{v['data_root']}/merge/mention/en.nam.bio",
                  f"{v['data_root']}/edl/merged_fine.tsv"),
            _dock("laituan245/spanbert_entity_coref", v["data_root"],
                  "-edl_official", f"{v['data_root']}/edl/en.linking.tab",
                  "-edl_freebase", f"{v['data_root']}/edl/en.linking.freebase.tab",
                  "-l", f"{v['data_root']}/ltf",
                  "-o", f"{v['data_root']}/edl/merged_final.tab", gpus=True),
            _dock("limanling/uiuc_ie_m36", v["data_root"],
                  "/opt/conda/envs/py36/bin/python",
                  "/entity/aida_edl/tab2cs.py",
                  f"{v['data_root']}/edl/merged_final.tab",
                  f"{v['data_root']}/edl/merged.cs", "EDL"),
        ],
        produces=lambda v: [
            f"{v['data_root']}/merge/cs/entity.cs",
            f"{v['data_root']}/edl/merged.cs",
        ],
    ),
    Stage(
        name="vision-ie",
        description="object detection + visual grounding + graph merging",
        reference="multimedia.sh:1-7",
        commands=lambda v: [
            ["docker", "run", "--rm", "-i",
             "-v", f"{v['data_root']}/vision:/root/input",
             "-v", f"{v['data_root']}:/root/output", "--gpus", "all",
             "yrf1/object-detection", "/bin/bash", "./full_script.sh"],
            ["docker", "run", "--rm", "-i",
             "-v", f"{v['data_root']}/vision:/root/LDC",
             "-v", f"{v['data_root']}/ltf:/root/ltf",
             "-v", f"{v['data_root']}:/root/shared",
             "-v", f"{v['cu_toolbox']}:/root/models", "--gpus", "all",
             "limanling/grounding-merging",
             "/root/conda/envs/aida-env/bin/python", "Visual_Grounding_mp.py"],
        ],
        produces=lambda v: [f"{v['data_root']}/vision"],
    ),
]


def docker_available() -> bool:
    return shutil.which("docker") is not None


def plan(data_root: str, cu_toolbox: str = "", edl_data: str = "",
         stages: Optional[Sequence[str]] = None) -> Dict[str, List[List[str]]]:
    """Render the exact commands per stage without running anything."""
    v = {"data_root": os.path.abspath(data_root),
         "cu_toolbox": cu_toolbox or os.path.join(data_root, "cu_toolbox"),
         "edl_data": edl_data or os.path.join(data_root, "edl_data")}
    wanted = set(stages) if stages else {s.name for s in STAGES}
    unknown = wanted - {s.name for s in STAGES}
    if unknown:
        raise ValueError(f"unknown stages {sorted(unknown)}; options: "
                         f"{[s.name for s in STAGES]}")
    return {s.name: s.commands(v) for s in STAGES if s.name in wanted}


def run(data_root: str, cu_toolbox: str = "", edl_data: str = "",
        stages: Optional[Sequence[str]] = None, dry_run: bool = True) -> bool:
    """Execute (or print, when dry_run) the pipeline stages in order.

    Returns True when every requested stage's artifacts exist afterwards.
    """
    v = {"data_root": os.path.abspath(data_root),
         "cu_toolbox": cu_toolbox or os.path.join(data_root, "cu_toolbox"),
         "edl_data": edl_data or os.path.join(data_root, "edl_data")}
    plans = plan(data_root, cu_toolbox, edl_data, stages)
    ok = True
    if not dry_run and not docker_available():
        log.error(
            "docker is not available on this host. Run the commands below on "
            "a docker-capable machine, or produce the same artifacts with "
            "another IE system; then point preprocess_descriptions.py at them."
        )
        # an explicitly requested --execute that cannot run is a failure:
        # print the plan, but exit nonzero so scripts/CI don't conclude the
        # IE stages ran
        dry_run = True
        ok = False
    for stage in STAGES:
        if stage.name not in plans:
            continue
        log.info("== stage %s: %s (reference %s)", stage.name,
                 stage.description, stage.reference)
        for cmd in plans[stage.name]:
            printable = " ".join(cmd)
            if dry_run:
                log.info("DRY-RUN: %s", printable)
                continue
            log.info("RUN: %s", printable)
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                log.error("stage %s failed (rc=%d): %s", stage.name,
                          proc.returncode, printable)
                ok = False
                break
        for artifact in stage.produces(v):
            if not dry_run and not os.path.exists(artifact):
                log.error("stage %s did not produce %s", stage.name, artifact)
                ok = False
    if dry_run:
        log.info(
            "next: python preprocess_descriptions.py --cfg <cfg.json> with "
            "cs_inputs pointing at %s/merge/cs and %s/edl/merged.cs",
            v["data_root"], v["data_root"],
        )
    return ok
