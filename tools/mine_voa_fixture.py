"""Mine the reference's shipped VOA visualization pages into a real-text
fixture.

`/root/reference/data/voa/voa_caption_visualization.zip` holds ~200 HTML
pages emitted by the reference's `data/voa/visualization.py:70-101` — the
only genuine CLIP-Event corpus text reachable offline: real VOA captions
with real IE results (event mentions with AIDA-seedling types, triggers
highlighted in the caption, and role-typed entity arguments with canonical
mentions).

This tool inverts that rendering back into the pipeline's INPUT artifacts:

  image_caption_mapping.json   {docid: {idx: {cap, url}}}   (dataset_voa.py:61 contract)
  edl.cs / event.cs            ColdStart lines `preprocess.ke.load_cs` parses
                               (reference preprocess_description_contrastive.py:20-113)
  templates.json               {type: {roles, template}} ontology templates
                               (reference neg_template input, :316-484)

so `preprocess_descriptions.py` → `train.py` → evals run end-to-end on real
captions. The HTML structure parsed here is exactly what visualization.py
writes: records start with `<imageid>: `, events render as
`<span style="color:red">:Event_N: TYPE</span>, <context with the trigger
in a blue span>`, arguments as `[Argument] ROLE=:Entity_...:NAME`, and the
image URL in an `<img src=...>` tag (visualization.py:74-98).

Usage: python tools/mine_voa_fixture.py --zip <zip> --out <dir> [--limit N]
"""

from __future__ import annotations

import argparse
import html as _html
import io
import json
import os
import re
import zipfile
from collections import OrderedDict, defaultdict

RECORD_RE = re.compile(r"(VOA_EN_NW_\d{4}_\d{2}_\d{2}_\d+_\d+): ")
EVENT_RE = re.compile(
    r'<span style="color:red">(:Event_\d+): ([^<]+)</span>, (.*)'
)
TRIGGER_RE = re.compile(r'<span style="color:blue">([^<]*)</span>')
ARG_RE = re.compile(r"\[Argument\] (\S+)=(:Entity[^:]*):(.*)")
IMG_RE = re.compile(r'<img src="([^"]+)"')
TAG_RE = re.compile(r"<[^>]+>")

ONTOLOGY = "https://tac.nist.gov/tracks/SM-KBP/2018/ontologies/SeedlingOntology"

# Ontology templates for every event type observed in the mined corpus,
# paper-style natural phrasing (CLIP-Event uses per-type verbalization
# templates with <argN> slots; the reference's template JSON is a private
# asset, so these are authored fresh against the AIDA seedling ontology).
# Role order defines the <argN> indices (templates.generate_descriptions).
TEMPLATES = {
    "Conflict.Attack": (
        ["Attacker", "Target", "Instrument", "Place"],
        "<arg1> attacked <arg2> using <arg3> at <arg4>.",
    ),
    "Conflict.Demonstrate": (
        ["Demonstrator", "Place"],
        "<arg1> demonstrated at <arg2>.",
    ),
    "Conflict.Coup.Coup": (
        ["DeposedEntity", "DeposingEntity", "Place"],
        "<arg1> was deposed by <arg2> in a coup at <arg3>.",
    ),
    "Conflict.Yield.Surrender": (
        ["Surrenderer", "Recipient", "Place"],
        "<arg1> surrendered to <arg2> at <arg3>.",
    ),
    "Conflict.Yield.Retreat": (
        ["Retreater", "Origin", "Destination"],
        "<arg1> retreated from <arg2> to <arg3>.",
    ),
    "Contact.Meet": (
        ["Participant", "Place"],
        "<arg1> met face-to-face at <arg2>.",
    ),
    "Contact.Contact": (
        ["Participant", "Place"],
        "<arg1> communicated at <arg2>.",
    ),
    "Contact.Broadcast": (
        ["Broadcaster", "Audience", "Place"],
        "<arg1> made a statement to <arg2> at <arg3>.",
    ),
    "Contact.Correspondence": (
        ["Participant", "Place"],
        "<arg1> corresponded remotely at <arg2>.",
    ),
    "Contact.Negotiate.Correspondence": (
        ["Participant", "Place"],
        "<arg1> negotiated remotely at <arg2>.",
    ),
    "Contact.PublicStatementInPerson.Broadcast": (
        ["Communicator", "Audience", "Place"],
        "<arg1> made a public statement to <arg2> at <arg3>.",
    ),
    "Contact.CommitmentPromiseExpressIntent.Broadcast": (
        ["Communicator", "Audience", "Place"],
        "<arg1> promised <arg2> at <arg3>.",
    ),
    "Movement.TransportArtifact": (
        ["Agent", "Artifact", "Origin", "Destination", "Instrument"],
        "<arg1> transported <arg2> from <arg3> to <arg4> using <arg5>.",
    ),
    "Movement.TransportPerson": (
        ["Agent", "Person", "Origin", "Destination", "Instrument"],
        "<arg1> transported <arg2> from <arg3> to <arg4> using <arg5>.",
    ),
    "Life.Die": (
        ["Agent", "Victim", "Instrument", "Place"],
        "<arg1> killed <arg2> with <arg3> at <arg4>.",
    ),
    "Life.Injure": (
        ["Agent", "Victim", "Instrument", "Place"],
        "<arg1> injured <arg2> with <arg3> at <arg4>.",
    ),
    "Life.Injure.IllnessDegredationSickness": (
        ["Victim", "Disease", "Place"],
        "<arg1> fell ill with <arg2> at <arg3>.",
    ),
    "Life.BeBorn": (["Person", "Place"], "<arg1> was born at <arg2>."),
    "Life.Marry": (["Person", "Place"], "<arg1> married at <arg2>."),
    "Life.Divorce": (["Person", "Place"], "<arg1> divorced at <arg2>."),
    "Personnel.Elect": (
        ["Elector", "Elect", "Place"],
        "<arg1> elected <arg2> at <arg3>.",
    ),
    "Personnel.EndPosition": (
        ["Person", "Organization", "Place"],
        "<arg1> stopped working at <arg2> at <arg3>.",
    ),
    "Personnel.StartPosition": (
        ["Person", "Organization", "Place"],
        "<arg1> started working at <arg2> at <arg3>.",
    ),
    "Personnel.Nominate": (
        ["Nominator", "Nominee", "Place"],
        "<arg1> nominated <arg2> at <arg3>.",
    ),
    "Justice.ArrestJail": (
        ["Agent", "Person", "Place"],
        "<arg1> arrested <arg2> at <arg3>.",
    ),
    "Justice.TrialHearing": (
        ["Adjudicator", "Defendant", "Prosecutor", "Place"],
        "<arg1> tried <arg2> prosecuted by <arg3> at <arg4>.",
    ),
    "Justice.ChargeIndict": (
        ["Prosecutor", "Defendant", "Adjudicator", "Place"],
        "<arg1> charged <arg2> before <arg3> at <arg4>.",
    ),
    "Justice.Convict": (
        ["Adjudicator", "Defendant", "Place"],
        "<arg1> convicted <arg2> at <arg3>.",
    ),
    "Justice.Sentence": (
        ["Adjudicator", "Defendant", "Place"],
        "<arg1> sentenced <arg2> at <arg3>.",
    ),
    "Justice.ReleaseParole": (
        ["Agent", "Person", "Place"],
        "<arg1> released <arg2> at <arg3>.",
    ),
    "Justice.Execute": (
        ["Agent", "Person", "Place"],
        "<arg1> executed <arg2> at <arg3>.",
    ),
    "Justice.Extradite": (
        ["Agent", "Person", "Origin", "Destination"],
        "<arg1> extradited <arg2> from <arg3> to <arg4>.",
    ),
    "Justice.Sue": (
        ["Plaintiff", "Defendant", "Adjudicator", "Place"],
        "<arg1> sued <arg2> before <arg3> at <arg4>.",
    ),
    "Justice.Appeal": (
        ["Defendant", "Prosecutor", "Adjudicator", "Place"],
        "<arg1> appealed against <arg2> before <arg3> at <arg4>.",
    ),
    "Justice.Pardon": (
        ["Adjudicator", "Defendant", "Place"],
        "<arg1> pardoned <arg2> at <arg3>.",
    ),
    "Justice.Acquit": (
        ["Adjudicator", "Defendant", "Place"],
        "<arg1> acquitted <arg2> at <arg3>.",
    ),
    "Justice.Fine": (
        ["Adjudicator", "Defendant", "Place"],
        "<arg1> fined <arg2> at <arg3>.",
    ),
    "Transaction.TransferOwnership": (
        ["Giver", "Recipient", "Thing", "Beneficiary", "Place"],
        "<arg1> gave <arg3> to <arg2> for <arg4> at <arg5>.",
    ),
    "Transaction.TransferMoney": (
        ["Giver", "Recipient", "Beneficiary", "Place"],
        "<arg1> paid <arg2> for <arg3> at <arg4>.",
    ),
    "Transaction.Transaction": (
        ["Giver", "Recipient", "Place"],
        "<arg1> transacted with <arg2> at <arg3>.",
    ),
    "ArtifactExistence.DamageDestroy": (
        ["DamagerDestroyer", "Artifact", "Instrument", "Place"],
        "<arg1> damaged or destroyed <arg2> with <arg3> at <arg4>.",
    ),
    "ArtifactExistence.DamageDestroy.Destroy": (
        ["Destroyer", "Artifact", "Instrument", "Place"],
        "<arg1> destroyed <arg2> with <arg3> at <arg4>.",
    ),
    "ArtifactExistence.DamageDestroy.Damage": (
        ["Damager", "Artifact", "Instrument", "Place"],
        "<arg1> damaged <arg2> with <arg3> at <arg4>.",
    ),
    "ArtifactExistence.Shortage.Shortage": (
        ["Experiencer", "Supply", "Place"],
        "<arg1> experienced a shortage of <arg2> at <arg3>.",
    ),
    "Manufacture.Artifact": (
        ["Manufacturer", "Artifact", "Place"],
        "<arg1> manufactured <arg2> at <arg3>.",
    ),
    "Business.Start": (
        ["Agent", "Organization", "Place"],
        "<arg1> started <arg2> at <arg3>.",
    ),
    "Business.End": (
        ["Agent", "Organization", "Place"],
        "<arg1> shut down <arg2> at <arg3>.",
    ),
    "Disaster.FireExplosion.FireExplosion": (
        ["FireExplosionObject", "Instrument", "Place"],
        "<arg1> caught fire or exploded from <arg2> at <arg3>.",
    ),
    "Disaster.DiseaseOutbreak.DiseaseOutbreak": (
        ["Disease", "Victim", "Place"],
        "<arg1> broke out among <arg2> at <arg3>.",
    ),
    "Disaster.AccidentCrash.AccidentCrash": (
        ["Vehicle", "CrashObject", "Place"],
        "<arg1> crashed into <arg2> at <arg3>.",
    ),
    "GenericCrime.GenericCrime.GenericCrime": (
        ["Perpetrator", "Victim", "Place"],
        "<arg1> committed a crime against <arg2> at <arg3>.",
    ),
    "Government.Agreements": (
        ["Participant", "Place"],
        "<arg1> signed an agreement at <arg2>.",
    ),
    "Government.Agreements.AcceptAgreementContractCeasefire": (
        ["Participant", "Place"],
        "<arg1> accepted an agreement at <arg2>.",
    ),
    "Government.Agreements.RejectNullifyAgreementContractCeasefire": (
        ["Participant", "Place"],
        "<arg1> rejected an agreement at <arg2>.",
    ),
    "Medical.Intervention.Intervention": (
        ["Treater", "Patient", "MedicalIssue", "Place"],
        "<arg1> treated <arg2> for <arg3> at <arg4>.",
    ),
    "Inspection.TargetAimAt.TargetAimAt": (
        ["Targeter", "Target", "Place"],
        "<arg1> aimed at <arg2> at <arg3>.",
    ),
}


def _clean(text: str) -> str:
    return " ".join(_html.unescape(TAG_RE.sub("", text)).split())


def parse_visualization_zip(zip_path: str, limit: int | None = None) -> "OrderedDict":
    """{image_id: {caption, urls, events: [{id, type, trigger, context,
    args: [(role, entity_id, name)]}]}} in page order."""
    records: "OrderedDict[str, dict]" = OrderedDict()
    zf = zipfile.ZipFile(zip_path)
    names = sorted(
        (n for n in zf.namelist()
         if n.endswith(".html") and "__MACOSX" not in n),
        key=lambda n: int(re.search(r"_(\d+)\.html$", n).group(1)),
    )
    for name in names:
        text = io.TextIOWrapper(
            zf.open(name), encoding="utf-8", errors="replace"
        ).read()
        # Records are delimited by their image-id headers.
        parts = RECORD_RE.split(text)
        for image_id, body in zip(parts[1::2], parts[2::2]):
            if image_id in records:
                continue
            rec = {"caption": "", "urls": [], "events": []}
            contexts: "OrderedDict[str, None]" = OrderedDict()
            event = None
            for line in body.split("\n"):
                m = EVENT_RE.search(line)
                if m:
                    ctx_raw = m.group(3)
                    tm = TRIGGER_RE.search(ctx_raw)
                    ctx = _clean(ctx_raw)
                    contexts.setdefault(ctx)
                    event = {
                        "id": m.group(1),
                        "type": m.group(2).strip(),
                        "trigger": _clean(tm.group(1)) if tm else "",
                        "context": ctx,
                        "args": [],
                    }
                    rec["events"].append(event)
                    continue
                m = ARG_RE.search(line)
                if m and event is not None:
                    event["args"].append(
                        (m.group(1), m.group(2), _clean(m.group(3)))
                    )
                    continue
                for url in IMG_RE.findall(line):
                    rec["urls"].append(url)
            rec["caption"] = " ".join(contexts)
            if rec["events"]:
                records[image_id] = rec
            if limit and len(records) >= limit:
                return records
    return records


def image_id_to_doc(image_id: str) -> tuple[str, str]:
    """VOA_EN_NW_2017_03_22_3777440_0 → (VOA_EN_NW_2017.03.22.3777440, '0')
    (reference visualization.py:90-95 inverted)."""
    docid, _, idx = image_id.rpartition("_")
    chars = list(docid)
    for pos in (14, 17, 20):
        chars[pos] = "."
    return "".join(chars), idx


def _offset(image_id: str, haystack: str, needle: str) -> str:
    start = haystack.find(needle) if needle else -1
    if start < 0:
        start, needle = 0, needle or " "
    return f"{image_id}:{start}-{start + max(len(needle) - 1, 0)}"


def build_templates(records: dict) -> dict:
    """Ontology templates for every type in the corpus; curated phrasing
    where known, generated otherwise. Roles not in the curated list are
    appended so every observed argument can fill a slot."""
    observed = defaultdict(list)
    for rec in records.values():
        for ev in rec["events"]:
            for role, _, _ in ev["args"]:
                short = role.split("_")[-1].replace("Prosecutor", "Adjudicator")
                if short not in observed[ev["type"]]:
                    observed[ev["type"]].append(short)
            observed.setdefault(ev["type"], [])

    out = {}
    for etype, obs_roles in sorted(observed.items()):
        roles, template = TEMPLATES.get(etype, (None, None))
        if roles is None:
            words = re.findall("[A-Z][^A-Z]*", etype.split(".")[-1])
            verb = " ".join(words).lower()
            roles = sorted(obs_roles)
            slots = " ".join(
                f"{r.lower()} <arg{i + 1}>," for i, r in enumerate(roles)
            ).rstrip(",")
            template = f"An image of {verb} event with {slots}." if roles else (
                f"An image of {verb} event."
            )
        else:
            roles = list(roles)
            for r in obs_roles:  # corpus roles the curated list missed
                if r not in roles:
                    roles.append(r)
                    template = template.rstrip(".") + f" involving <arg{len(roles)}>."
        out[etype] = {"roles": roles, "template": template}
    return out


def write_fixture(records: dict, out_dir: str) -> dict:
    """Emit caption json + ColdStart cs files + templates. Returns paths."""
    os.makedirs(out_dir, exist_ok=True)

    captions: dict = defaultdict(dict)
    for image_id, rec in records.items():
        doc, idx = image_id_to_doc(image_id)
        captions[doc][idx] = {
            "cap": rec["caption"],
            "url": rec["urls"][0] if rec["urls"] else "",
        }
    cap_path = os.path.join(out_dir, "image_caption_mapping.json")
    json.dump(captions, open(cap_path, "w"), indent=1)

    # ColdStart lines in load_cs's shape (ke.py:36-100): entities first so
    # event-argument lines can resolve mention text + canonical mentions.
    edl_lines, evt_lines = [], []
    seen_canonical: set = set()
    seen_mention: set = set()
    for image_id, rec in records.items():
        caption = rec["caption"]
        for ev in rec["events"]:
            for role, ent_id, name in ev["args"]:
                off = _offset(image_id, caption, name)
                if ent_id not in seen_canonical:
                    seen_canonical.add(ent_id)
                    edl_lines.append(f"{ent_id}\ttype\t{ONTOLOGY}#Entity\t1.0")
                    edl_lines.append(
                        f'{ent_id}\tcanonical_mention\t"{name}"\t{off}\t1.0'
                    )
                if (ent_id, off) not in seen_mention:
                    seen_mention.add((ent_id, off))
                    edl_lines.append(f'{ent_id}\tmention\t"{name}"\t{off}\t1.0')
    for image_id, rec in records.items():
        caption = rec["caption"]
        for ev in rec["events"]:
            evt_lines.append(f"{ev['id']}\ttype\t{ONTOLOGY}#{ev['type']}\t1.0")
            evt_lines.append(
                f'{ev["id"]}\tcanonical_mention.actual\t"{ev["trigger"]}"\t'
                f"{_offset(image_id, caption, ev['trigger'])}\t1.0"
            )
            for role, ent_id, name in ev["args"]:
                evt_lines.append(
                    f"{ev['id']}\t{ONTOLOGY}#{role}.actual\t{ent_id}\t"
                    f"{_offset(image_id, caption, name)}\t1.0"
                )
    edl_path = os.path.join(out_dir, "edl.cs")
    evt_path = os.path.join(out_dir, "event.cs")
    open(edl_path, "w").write("\n".join(edl_lines) + "\n")
    open(evt_path, "w").write("\n".join(evt_lines) + "\n")

    tmpl_path = os.path.join(out_dir, "templates.json")
    json.dump(build_templates(records), open(tmpl_path, "w"), indent=1)
    return {
        "captions": cap_path,
        "edl_cs": edl_path,
        "event_cs": evt_path,
        "templates": tmpl_path,
        "n_images": len(records),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--zip", default="/root/reference/data/voa/voa_caption_visualization.zip"
    )
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()
    records = parse_visualization_zip(args.zip, limit=args.limit)
    info = write_fixture(records, args.out)
    n_events = sum(len(r["events"]) for r in records.values())
    print(
        f"mined {info['n_images']} images / {n_events} events → {args.out}"
    )


if __name__ == "__main__":
    main()
