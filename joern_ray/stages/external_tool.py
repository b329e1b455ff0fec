"""External-tool extraction actor: the AstGenRunner subprocess analog.

The reference shells out to per-language ``astgen`` binaries and parses
their JSON output (``x2cpg/astgen/AstGenRunner.scala:120-210``: resolve
binary, spawn, collect stdout, parse).  The Ray-Data analog is an actor
pool whose actors each hold ONE long-lived subprocess (spawned in
``__init__`` — the expensive-setup-per-actor contract) and stream batches
through it over a line-delimited JSON pipe protocol:

    driver row  →  {"conv_id", "turn_idx", "role", "text", "tool"}\\n
    tool reply  →  {"events": [[subj, pred, obj, subj_kind, obj_kind,
                                 sent_idx, negated, in_question, is_past,
                                 aspect, slot_idx, clause, desc_key], ...]}\\n

There is no astgen binary in this environment, so the default external
tool is a small Python worker script (``_WORKER_SRC``) executed with
``sys.executable`` — a REAL subprocess with the real pipe protocol, whose
extraction logic is the serial oracle (joern_ray.extract.oracle).  Any
other command implementing the protocol can be passed as ``argv`` — the
Ray-side plumbing (actor lifecycle, restart-on-crash via a dead-pipe
respawn, batch framing, schema) does not change.

Scale notes: one subprocess per actor, ``concurrency`` actors per node;
the pipe carries only the narrow transcript columns and the narrow event
rows, never Arrow buffers; a crashed tool is respawned on the next batch
(the per-batch work is stateless on the tool side).
"""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow as pa

import ray.data

from .. import schema as S
from ..stages import extract as X

# The stand-in external tool: reads row-JSONL from stdin, emits one
# events-JSONL reply per input line.  Runs the SERIAL oracle extractor —
# an implementation independent of the vectorized Arrow kernel, so the
# pytest equivalence check (actor-pool output == in-process output) is a
# meaningful dual-run, not a tautology.  NOTE: per-row invocation means
# pronoun events stay UNRESOLVED (subj null), exactly like Stage A.
_WORKER_SRC = r"""
import json, sys
from joern_ray.extract import oracle as O
from joern_ray.functions import rules as R
import re

for line in sys.stdin:
    row = json.loads(line)
    evs = []
    if row.get("role") == "tool" and row.get("tool"):
        evs.append([row["conv_id"], R.INVOKED_PRED, row["tool"],
                    "conv", "tool", 0, False, False, False, "simple",
                    None, False, 0, R.DEFAULT_CLAUSE, None])
    else:
        text = row.get("text") or ""
        sents = R.split_sentences(text)
        for si, sent in enumerate(sents):
            since_m = re.search(R.SINCE_RE, sent)
            attrs = [si, R.NEGATION_MARK in sent,
                     sent.endswith(R.QUESTION_MARK),
                     bool(re.search(R.PAST_RE, sent)
                          and not re.search(R.PRES_PASSIVE_RE, sent)
                          and not re.search(R.PRES_PERFECT_RE, sent)),
                     (R.ASPECT_PROG if re.search(R.PROG_RE, sent)
                      else R.ASPECT_PERF if re.search(R.PERF_RE, sent)
                      else R.ASPECT_SIMPLE),
                     int(since_m.group("year")) if since_m else None,
                     R.HEDGE_MARK in sent]
            matched = False
            for pred, rx, ok in R.COMPILED_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    evs.append([None, pred, m.group("obj"), "person", ok,
                                *attrs, 0, R.DEFAULT_CLAUSE, None])
                    matched = True
                    break
            if matched:
                continue
            # plural-pronoun templates (v32): unresolved plural event —
            # subj null, clause 'plural'; Stage B expands it over the
            # anchor turn's committed person set
            for pred, rx, ok in R.COMPILED_PLURAL_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    evs.append([None, pred, m.group("obj"), "person", ok,
                                *attrs, 0, R.PLURAL_CLAUSE, None])
                    matched = True
                    break
            if matched:
                continue
            # plural-reciprocal templates (v34): both slots null —
            # Stage B expands over every ordered anchor-set pair
            for pred, rx in R.COMPILED_PLURAL_RECIP_TEMPLATES:
                m = rx.match(sent)
                if m:
                    evs.append([None, pred, None, "person", "person",
                                *attrs, 0, R.PLURAL_RECIP_CLAUSE, None])
                    matched = True
                    break
            if matched:
                continue
            # ORG-pronoun templates (v38): a descriptor-class event
            # (subj null, desc_key = the reserved ORG_REF_KEY) with
            # subj_kind 'org' — Stage B resolves it against the org
            # referent state
            for pred, rx, ok in R.COMPILED_ORG_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    evs.append([None, pred, m.group("obj"), "org", ok,
                                *attrs, 0, R.ORG_PRON_CLAUSE,
                                R.ORG_REF_KEY])
                    matched = True
                    break
            if matched:
                continue
            for pred, rx, ok in R.COMPILED_PRONOUN_OBJECT_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                if m.group("subj") in R.SUBJ_PRONOUNS:
                    break
                evs.append([m.group("subj"), pred, None, "person", ok,
                            *attrs, 0, R.DEFAULT_CLAUSE, None])
                matched = True
                break
            if matched:
                continue
            # object pronouns inside quoted speech (v18)
            for pred, rx, ok in \
                    R.COMPILED_QUOTED_PRONOUN_OBJECT_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                if m.group("subj") in R.SUBJ_PRONOUNS:
                    break
                evs.append([m.group("subj"), pred, None, "person", ok,
                            *attrs, 0, R.QUOTED_CLAUSE, None])
                matched = True
                break
            if matched:
                continue
            for pred, rx, sk, ok in R.COMPILED_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                if m.group("subj") in R.SUBJ_PRONOUNS:
                    continue
                evs.append([m.group("subj"), pred, m.group("obj"), sk, ok,
                            *attrs, 0, R.DEFAULT_CLAUSE, None])
                break
            for name, rx, emissions in R.COMPILED_MULTI_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                for pred, sg, sk, og, ok, slot, clause in emissions:
                    obj_is_pron = (ok == "person"
                                   and m.group(og) in R.OBJ_PRONOUNS)
                    if m.group(sg) in R.SUBJ_PRONOUNS:
                        # pronoun in a person slot: unresolved pronoun
                        # event carrying the emission's slot/clause;
                        # both-pronoun emissions drop (v21 rule)
                        if sk == "person" and not obj_is_pron:
                            evs.append([None, pred, m.group(og), sk, ok,
                                        *attrs, slot, clause, None])
                        continue
                    if obj_is_pron:
                        # v21 object-pronoun rule: explicit subj, NULL
                        # obj — Stage B fills the object downstream
                        evs.append([m.group(sg), pred, None, sk, ok,
                                    *attrs, slot, clause, None])
                        continue
                    evs.append([m.group(sg), pred, m.group(og), sk, ok,
                                *attrs, slot, clause, None])
                break
            # LIST templates (open-ended coordination): split the captured
            # head on the shared separator, one event per member
            for name, rx, pred, mk, ok, clause in R.COMPILED_LIST_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                members = m.group("list").split(R.LIST_SEP) + [
                    m.group("last")]
                for slot, mem in enumerate(members):
                    if mem in R.SUBJ_PRONOUNS:
                        if mk == "person":
                            evs.append([None, pred, m.group("obj"), mk, ok,
                                        *attrs, slot, clause, None])
                        continue
                    evs.append([mem, pred, m.group("obj"), mk, ok,
                                *attrs, slot, clause, None])
                break
            # definite-description templates: descriptor event (subj NULL,
            # desc_key = the module), resolved downstream in Stage B
            for pred, rx, ok, clause in R.COMPILED_DESC_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                evs.append([None, pred, m.group("obj"), "person", ok,
                            *attrs, 0, clause, m.group("key")])
                break
            # ORG-keyed descriptors (v28): desc event, key = lowercased
            # org base — resolved downstream against the normalized
            # works_at state
            for pred, rx, ok, clause in R.COMPILED_DESC_ORG_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                evs.append([None, pred, m.group("obj"), "person", ok,
                            *attrs, 0, clause, m.group("key").lower()])
                break
            # OBJECT-side definite descriptions (v15): explicit subject,
            # NULL obj, desc_key — Stage B fills the object; pronoun
            # subjects skip (rules.py contract)
            for pred, rx, clause in R.COMPILED_DESC_OBJ_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                if m.group("subj") in R.SUBJ_PRONOUNS:
                    break
                evs.append([m.group("subj"), pred, None, "person",
                            "person", *attrs, 0, clause, m.group("key")])
                break
            # untyped-mention overlay event (kind-recovery input): an
            # independent re-match of rules.MENTIONED_RE, mirroring the
            # kernel's fused emission (obj_kind='unknown')
            m = re.match(R.MENTIONED_RE, sent)
            if m and m.group("subj") not in R.SUBJ_PRONOUNS:
                evs.append([m.group("subj"), R.MENTIONED_PRED,
                            m.group("obj"), "person", R.UNKNOWN_KIND,
                            *attrs, 0, R.DEFAULT_CLAUSE, None])
    sys.stdout.write(json.dumps({"events": evs}) + "\n")
    sys.stdout.flush()
"""


class ExternalToolExtractor:
    """Actor-pool stage: per-actor subprocess, JSONL pipe protocol.

    Use as::

        ds.map_batches(ExternalToolExtractor, concurrency=(2, 8),
                       batch_size=1024, num_cpus=1, batch_format="pyarrow")
    """

    def __init__(self, argv: list[str] | None = None):
        self._argv = argv or [sys.executable, "-u", "-c", _WORKER_SRC]
        self._proc: subprocess.Popen | None = None
        self._spawn()

    def _spawn(self) -> None:
        # the worker subprocess must be able to import joern_ray no matter
        # what cwd the Ray worker runs in — prepend the package root
        import os

        import joern_ray
        pkg_root = os.path.dirname(os.path.dirname(
            os.path.abspath(joern_ray.__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        self._proc = subprocess.Popen(
            self._argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1, env=env)

    def _roundtrip(self, row: dict) -> list[list]:
        p = self._proc
        if p is None or p.poll() is not None:   # tool died → respawn once
            self._spawn()
            p = self._proc
        p.stdin.write(json.dumps(row) + "\n")
        p.stdin.flush()
        reply = p.stdout.readline()
        if not reply:
            raise RuntimeError(
                f"external tool {self._argv[0]} closed its pipe "
                f"(rc={p.poll()})")
        return json.loads(reply)["events"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs, turns, rows = [], [], []
        for r in batch.select(
                ["conv_id", "turn_idx", "role", "text", "tool"]).to_pylist():
            for ev in self._roundtrip(r):
                convs.append(r["conv_id"])
                turns.append(r["turn_idx"])
                rows.append(ev)
        if not rows:
            return S.EVENTS.empty_table()
        cols = list(zip(*rows))
        return pa.table({
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "subj": pa.array(cols[0], pa.string()),
            "pred": pa.array(cols[1], pa.string()),
            "obj": pa.array(cols[2], pa.string()),
            "subj_kind": pa.array(cols[3], pa.string()),
            "obj_kind": pa.array(cols[4], pa.string()),
            "sent_idx": pa.array(cols[5], pa.int32()),
            "negated": pa.array(cols[6], pa.bool_()),
            "in_question": pa.array(cols[7], pa.bool_()),
            "is_past": pa.array(cols[8], pa.bool_()),
            "aspect": pa.array(cols[9], pa.string()),
            "since_year": pa.array(cols[10], pa.int32()),
            "hedged": pa.array(cols[11], pa.bool_()),
            "slot_idx": pa.array(cols[12], pa.int32()),
            "clause": pa.array(cols[13], pa.string()),
            "desc_key": pa.array(cols[14], pa.string()),
        }).cast(S.EVENTS)

    def __del__(self):
        try:
            if self._proc and self._proc.poll() is None:
                self._proc.stdin.close()
                self._proc.terminate()
        except Exception:
            pass


def extract_events_external(transcripts_ds: "ray.data.Dataset", *,
                            argv: list[str] | None = None,
                            concurrency=(1, 4), batch_size: int = 1024
                            ) -> "ray.data.Dataset":
    """Transcripts → extraction events via the external-tool actor pool.
    Output is byte-compatible with ``extract.extract_events`` (pytest
    asserts set equality of the two paths)."""
    return transcripts_ds.map_batches(
        ExternalToolExtractor,
        fn_constructor_kwargs=({"argv": argv} if argv else {}),
        concurrency=concurrency, batch_size=batch_size,
        num_cpus=1, batch_format="pyarrow")
