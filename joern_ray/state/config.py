"""Externally-loaded semantics/rules config — the analog of the reference's
dataflow-semantics loader (``dataflowengineoss/.../semanticsloader/
Parser.scala:1-211`` parses flow-summary files; ``OssDataFlow.scala:15-18``
merges ``extraFlows`` onto the built-in defaults) and of the querydb rule
packaging: rules live in a JSON document a user can ship WITHOUT touching
engine code, and merge onto the built-in defaults.

Config shape (all sections optional)::

    {
      "templates": [            # extra extraction templates (rules.TEMPLATES)
        {"pred": "...", "regex": "^...(?P<subj>...)...(?P<obj>...)$",
         "subj_kind": "person", "obj_kind": "org"}
      ],
      "multi_templates": [      # multi-relation templates (rules.MULTI_TEMPLATES)
        {"name": "...", "regex": "^...named groups...$",
         "emissions": [         # one relation row per emission per match
           {"pred": "...", "subj_group": "g", "subj_kind": "person",
            "obj_group": "h", "obj_kind": "org",
            "slot_idx": 0, "clause": "main"}]}
      ],
      "findings_rules": [       # extra scan rules (regex predicate per turn)
        {"rule": "...", "severity": "info|warning",
         "pattern": "...",      # RE2, matched against text
         "evidence": "text"}    # text | role | tool
      ],
      "extra_flows": [          # extra reachability edges (kind/norm pairs)
        {"a_kind": "...", "a_norm": "...", "b_kind": "...", "b_norm": "..."}
      ]
    }

Loaded once per driver (vocabulary-sized), validated eagerly (fail fast at
load, not inside a worker), then applied via the engine's normal extension
points — extraction templates append to the compiled pack, findings rules
become vectorized RE2 map stages, extra flows union onto the edge set
before BFS.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class Semantics:
    templates: list[tuple[str, str, str, str]] = field(default_factory=list)
    multi_templates: list[tuple] = field(default_factory=list)
    findings_rules: list[dict] = field(default_factory=list)
    extra_flows: list[tuple[str, str, str, str]] = field(default_factory=list)


_KINDS = {"person", "org", "tool", "module", "conv"}
_SEVERITIES = {"info", "warning", "error"}


def load_semantics(path: str) -> Semantics:
    """Parse + validate a semantics JSON file (fail fast on bad regexes or
    unknown kinds — the Parser.scala eager-validation discipline)."""
    with open(path) as f:
        doc = json.load(f)
    return parse_semantics(doc)


def _validate_re2(pattern: str) -> None:
    """Eager RE2 validation: the rules execute under Arrow/DuckDB RE2, so
    Python-re-only syntax (lookbehind, lookahead) must fail at LOAD, not
    inside a Ray worker.  A 0-row kernel invocation compiles the pattern in
    RE2 itself."""
    import pyarrow as pa
    import pyarrow.compute as pc
    try:
        # must be a non-empty array: the kernel skips regex compilation
        # entirely for 0-row inputs
        pc.match_substring_regex(pa.array([""], pa.string()), pattern)
    except Exception as ex:
        raise ValueError(f"pattern {pattern!r} is not valid RE2: {ex}") from ex


def parse_semantics(doc: dict) -> Semantics:
    out = Semantics()
    for t in doc.get("templates", []):
        rx = t["regex"]
        _validate_re2(rx)
        compiled = re.compile(rx)
        if "subj" not in compiled.groupindex or \
                "obj" not in compiled.groupindex:
            raise ValueError(
                f"template {t.get('pred')!r}: regex must define named "
                "groups (?P<subj>...) and (?P<obj>...)")
        for k in (t["subj_kind"], t["obj_kind"]):
            if k not in _KINDS:
                raise ValueError(f"unknown kind {k!r}")
        out.templates.append((t["pred"], rx, t["subj_kind"], t["obj_kind"]))
    for m in doc.get("multi_templates", []):
        rx = m["regex"]
        _validate_re2(rx)
        compiled = re.compile(rx)
        emissions = []
        for e in m.get("emissions", []):
            for g in (e["subj_group"], e["obj_group"]):
                if g not in compiled.groupindex:
                    raise ValueError(
                        f"multi template {m.get('name')!r}: emission "
                        f"references unknown capture group {g!r}")
            for k in (e["subj_kind"], e["obj_kind"]):
                if k not in _KINDS:
                    raise ValueError(f"unknown kind {k!r}")
            slot = int(e.get("slot_idx", 0))
            if slot < 0:
                raise ValueError("slot_idx must be >= 0")
            emissions.append((e["pred"], e["subj_group"], e["subj_kind"],
                              e["obj_group"], e["obj_kind"], slot,
                              str(e.get("clause", "main"))))
        if not emissions:
            raise ValueError(
                f"multi template {m.get('name')!r}: needs >=1 emission")
        out.multi_templates.append((m["name"], rx, emissions))
    for r in doc.get("findings_rules", []):
        _validate_re2(r["pattern"])
        re.compile(r["pattern"])  # the Python-oracle side must accept too
        if r.get("severity", "info") not in _SEVERITIES:
            raise ValueError(f"unknown severity {r.get('severity')!r}")
        if r.get("evidence", "text") not in ("text", "role", "tool"):
            raise ValueError(f"unknown evidence column "
                             f"{r.get('evidence')!r}")
        out.findings_rules.append({
            "rule": r["rule"], "severity": r.get("severity", "info"),
            "pattern": r["pattern"], "evidence": r.get("evidence", "text")})
    for e in doc.get("extra_flows", []):
        for k in (e["a_kind"], e["b_kind"]):
            if k not in _KINDS:
                raise ValueError(f"unknown kind {k!r}")
        out.extra_flows.append((e["a_kind"], e["a_norm"],
                                e["b_kind"], e["b_norm"]))
    return out


def config_findings_rules(sem: Semantics):
    """Semantics → list of vectorized per-batch rule functions with the
    FINDINGS output schema (each compiled once at closure build, the
    per-actor regex-cache idiom)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.findings import FINDINGS, _table

    fns = []
    for r in sem.findings_rules:
        def fn(batch: pa.Table, _r=r) -> pa.Table:
            mask = pc.fill_null(pc.match_substring_regex(
                batch.column("text"), _r["pattern"]), False)
            sub = batch.filter(mask)
            return _table(_r["rule"], _r["severity"], sub.column("conv_id"),
                          sub.column("turn_idx").cast(pa.int32()),
                          sub.column(_r["evidence"]), sub.num_rows)
        fns.append(fn)
    return fns
