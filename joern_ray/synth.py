"""Deterministic synthetic transcript corpus (seeded; no external data).

The reference's test strategy builds CPGs from inline code snippets
(``x2cpg/src/test/.../testfixtures/Code2CpgFixture.scala:16-39``); our analog
is a seeded conversation generator whose ground-truth triples are emitted
alongside, so extraction/linking P/R is measurable end-to-end.

Every conversation is a pure function of ``(SEED, conv_idx)`` — generation is
embarrassingly parallel and reproducible regardless of partitioning, so the
same corpus can be produced by a plain loop (tests) or by
``ray.data.range(n).map_batches`` (large scale) with identical bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schema as S
from .functions import rules as R

SEED = 42
CORPUS_VERSION = "v38"  # v38: ORG-PRONOUN anaphora — "It acquired
#                         Globex Inc." resolves to the committed org
#                         surface of the latest strictly-earlier turn
#                         (object shadows subject; turn max; resolved
#                         rows feed no state so "It" chains co-refer);
#                         rides the generic descriptor machinery under
#                         the reserved key rules.ORG_REF_KEY; generated
#                         as atomic works_at-anchor + "It" pairs (~2%).
#                         v37: HEDGE over the MULTI-SLOT families —
#                         coordination (2/3/N-way), reciprocal,
#                         ditransitive, quoted speech, the passive
#                         (adverb BEFORE the auxiliary chain — the
#                         zero-kernel-edit position) and the plural
#                         reciprocal; ~5% per accepting construct.
#                         v36: HEDGE attribute — the SIXTH relation
#                         attribute: 'reportedly' before the verb group
#                         of the four alternating singular families +
#                         singular/plural pronoun variants (~5%),
#                         composing with negation ('reportedly no longer
#                         works'), aspect and the temporal adjunct.
#                         hedged = contains(sent, 'reportedly ') — the
#                         NEGATION_MARK substring discipline, shared by
#                         all four implementations.
#                         v35: ASPECT over the five intrinsically-past
#                         SINGULAR families (met-with / joined / left /
#                         acquired / partnered): 'is/was meeting with',
#                         'has/had joined', 'is leaving', ... at ~7%
#                         progressive + ~7% perfect each, composing with
#                         the v33 temporal adjunct on perfect groups
#                         (these templates gain SINCE_OPT).  Kernels:
#                         joining/leaving/acquiring/partnering join
#                         PROG_RE, joined/left/acquired/partnered join
#                         PERF_RE, and the irregular participle 'left'
#                         joins the PRES_PERFECT_RE carve-out ('has
#                         left' is non-past).
#                         v34: PLURAL RECIPROCAL — "They met." expands
#                         to every ORDERED PAIR of distinct anchor-set
#                         members (k members => k*(k-1) met triples,
#                         slot_idx = subject's lexicographic rank,
#                         clause 'plural_recip') — the quadratic analog
#                         of the v32 linear fan-out; ~30% of plural
#                         follow-up turns realize it (full v29 plural
#                         aspect alternation on 'met').
#                         v33: SINCE-<year> temporal adjunct — the FIFTH
#                         relation attribute: ~50% of PERFECT verb
#                         groups in the four alternating singular
#                         families and BOTH pronoun variants carry a
#                         sentence-final ' since <year>' ([2005, 2024]);
#                         the int32 since_year attribute flows through
#                         events → the narrow resolve exchange → the
#                         plural set expansion → TRIPLES_SURFACE → the
#                         exttool pipe (14 → 15 slots) → SQL _attr_cols.
#                         v32: PLURAL-PRONOUN anaphora — "They ..."
#                         resolves to the FULL committed person set of
#                         the anchor turn (one triple per member,
#                         slot_idx = lexicographic rank, clause
#                         'plural'); the singular referent is max(set),
#                         so both rules read one state stream.  The
#                         first construct whose resolution EXPANDS one
#                         event into a variable number of triples.
#                         Generation: atomic coordination+plural pairs
#                         (the set is known by construction); ~30%
#                         chain a second plural turn (co-reference —
#                         resolved rows feed no state).
#                         v31: ASPECT over the PASSIVE — the passive
#                         auxiliary chain alternates simple (is/was),
#                         progressive (is/was being) and perfect
#                         (has/had been) before 'maintained by'; the
#                         tense contract gains the 'is being' and
#                         'has been' carve-outs (PRES_PASSIVE_RE
#                         optional 'being ', PRES_PERFECT_RE 'been'),
#                         and 'being'/'been' join PROG_RE/PERF_RE.
#                         Generation: _passive_cop realizes the six
#                         forms (~15% was, ~7% being, ~7% been).
#                         v30: PLURAL coordination aspect — the
#                         coord / coord3 / coordN / quoted-coord verb
#                         groups alternate are/were V-ing and have/had
#                         V-ed (the v29 plural auxiliaries; template +
#                         synth change only, zero kernel edits).
#                         v29: ASPECT over the ditransitive / reciprocal
#                         / quoted families — 'is/was introducing' +
#                         'has/had introduced' (plain AND quoted-nested
#                         ditransitive), 'are/were meeting' + 'have/had
#                         met' (reciprocal; plural auxiliaries join
#                         PROG_RE/PAST_RE/PRES_PERFECT_RE), and the full
#                         uses-family alternation inside quoted speech.
#                         Generation: _aspect_past_verb(_pl) realize the
#                         progressive/perfect groups at ~7% each; the
#                         aspect/tense kernels stay sentence-level
#                         lexical contracts shared by all four
#                         implementations.
#                         v28: ORG-keyed cross-sentence appositive
#                         descriptors ("The Acme engineer met with Bob.")
#                         — the third descriptor-state family: every
#                         explicit works_at(person, org) commits state
#                         under the NORMALIZED org surface (typo'd
#                         surfaces commit under THEIR normalized key —
#                         the surface-keyed contract; fuzzy unification
#                         stays canonicalization's job); descriptors
#                         resolve lower(<base>) against it, clause
#                         'definite_org'.  synth tracks the state with a
#                         turn-level scan over the SHARED works_at
#                         templates (_works_at_commits), so generated
#                         descriptors always agree with the engine.
#                         v27: ASPECT attribute (simple | progressive |
#                         perfect) — the fourth relation attribute: the
#                         four alternating verb families (works_at / uses
#                         / maintains / manages, incl. their pronoun
#                         templates) realize progressive ('is/was
#                         working', ~7%) and perfect ('has/had worked',
#                         ~7%) verb groups; the sentence-level lexical
#                         kernel (rules.PROG_RE / PERF_RE) classifies
#                         them, and the is_past contract gains the
#                         present-perfect carve-out ('has worked' is NOT
#                         past; 'had worked' and 'was working' are).
#                         v26: pronoun CHAINS across multi-sentence quoted
#                         speech ('X said "She uses y daily. She maintains
#                         m."') — every intra-quote pronoun resolves
#                         independently in the QUOTING turn's scope (no
#                         intra-quote binding), so a chain co-refers; a
#                         pronoun may also fill the FIRST inner slot with
#                         an explicit second subject (which commits).
#                         v25: pronoun-in-appositive ("Bob, her manager,
#                         joined Initech.") — the grammar's first lowercase
#                         mid-sentence pronoun; manages(Bob, referent) via
#                         the object-pronoun class + joined(Bob, org).
#                         v24: TENSE attribute (is_past) — past-form verb
#                         alternants ('worked at', 'used ... daily',
#                         'maintained', 'managed', 'manager was',
#                         'was maintained by') generated at ~15% in the
#                         alternating template families; the lexical
#                         is_past kernel (rules.PAST_RE minus the
#                         present-passive carve-out) is the third
#                         relation attribute after negated/in_question
# v23: MULTI-SENTENCE quoted speech (quote-aware
#                         splitter: 'X said "A uses t daily. She maintains
#                         m."' is ONE sentence; the inner pronoun resolves
#                         in the QUOTING turn's scope, the explicit inner
#                         maintains subject feeds descriptor state)
# v22: DITRANSITIVE nested in QUOTED speech
#                         ('X said "Alice introduced Bob to Carol."' —
#                         the v20 double emission under the quoting
#                         contract, clause 'quoted', turn-final).
#                         v21: RECIPROCAL coordination ('Alice and Bob
#                         met.' — symmetric verb, the relation emits in
#                         BOTH directions, slot_idx = the row subject's
#                         coordination position, clause 'reciprocal';
#                         a pronoun member yields a pronoun-SUBJECT event
#                         one way and an OBJECT-pronoun event the other —
#                         the first multi construct to use the v21
#                         object-pronoun rule in rules.py).
#                         v20: DITRANSITIVE ('Alice introduced Bob to
#                         Carol.' — one verb, three NP slots; recipient =
#                         second object of the SAME relation at slot_idx 1,
#                         clause 'ditransitive'; both objects feed referent
#                         state, pronoun subjects ride the generic arm).
#                         v19: VP coordination ('X maintains m and uses
#                         t daily.' — one subject, two relations, clause
#                         'vp_coord') and POSTPOSED speech attribution
#                         ('"Bob uses t daily," said X.' — quote before
#                         the attribution, quoted_uses contract).
#                         v18: OBJECT pronouns inside quoted speech
#                         ('X said "Bob met with her."' — quoting-turn
#                         scope; the inner subject anchors + commits, the
#                         speaker never does; clause 'quoted');
#                         v17: manager descriptors NESTED in quoted speech
#                         ('X said "The manager of Bob met with Carol."' —
#                         quoting-turn scope, clause 'quoted_definite');
#                         v16: manager-family descriptors ("The manager of
#                         Bob met with Carol." / "Carol met with the
#                         manager of Bob.") — the descriptor state is
#                         generic over DESC_STATE_PREDS (maintains AND
#                         manages), person-keyed and module-keyed families
#                         sharing one disjoint-key state map;
#                         v15: OBJECT-side definite descriptions ("Bob met
#                         with the maintainer of auth.core." — the OBJECT
#                         resolves to the committed maintainer, the
#                         explicit subject commits referent state: the
#                         object-pronoun discipline x descriptor state);
#                         v14: definite descriptions NESTED IN QUOTED
#                         speech ('X said "The maintainer of auth.core met
#                         with Bob."' — resolves in the quoting turn's
#                         scope, clause='quoted_definite') and TOOL-object
#                         descriptors ("The maintainer of auth.core uses
#                         search daily." — kind-conditional feed: the tool
#                         object commits no referent state);
#                         v13: org-object definite descriptions ("The
#                         maintainer of auth.core joined Globex Corp." —
#                         the explicit org object feeds NO pronoun state:
#                         the kind-conditional feed rule, exercised
#                         corpus-wide);
#                         v12: open-ended coordination LISTS ("A, B, C and
#                         D work at X." with 4-6 names, incl. a pronoun
#                         member variant) and CROSS-SENTENCE definite
#                         descriptions ("The maintainer of auth.core met
#                         with Bob." resolving against module-keyed
#                         committed maintainer state);
#                         v11: pronouns INSIDE quoted speech ('X said "She
#                         uses y daily."' and 'X said "She and Bob use y
#                         daily."') — resolved in the QUOTING turn's scope
#                         (speaker is not an emitted slot; documented
#                         referent-scope contract in rules.py);
#                         v10: untyped-mention turns ("Alice mentioned
#                         Acme Corp." — object kind UNKNOWN at extraction,
#                         typed by the bounded 2-round kind-recovery pass:
#                         conv-local evidence, then the global surface
#                         vocabulary; ~25% draw never-typed surfaces or
#                         global-only evidence);
#                         v9: OBJECT-side pronoun turns ("Alice met with
#                         her." — pronoun fills the object slot, resolved
#                         to the committed referent; the explicit subject
#                         anchors the relation and commits state);
#                         v8: 3-way subject coordination, coordination NESTED
#                         inside quoted speech, and pronoun subjects inside
#                         coordinated constructs ("She and Bob work at X" /
#                         "Bob and She use y daily" — resolved via Stage B
#                         with the emission's slot_idx/clause);
#                         v7: possessive-pronoun turns ("Her manager is X",
#                         inverse-predicate managed_by via pronoun machinery);
#                         v6: object-side coordination ("works at both");
#                         v5: passive voice + possessive constructs;
#                         v4: multi-relation sentences (coordination /
#                         appositive / relative clause / quoted speech);
#                         v3: 10-template grammar; v2: multi-sentence
BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z
CORPUS_ROOT = "/tmp/joern_ray_corpus"

GT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj_kind", pa.string()),
    ("subj", pa.string()),           # canonical
    ("pred", pa.string()),
    ("obj_kind", pa.string()),
    ("obj", pa.string()),            # canonical
])


def _skew_index(rng: np.random.Generator, n: int, alpha: float = 2.5) -> int:
    """Zipf-ish skewed index in [0, n): index 0 is the hot key."""
    return min(n - 1, int(n * (rng.random() ** alpha)))


def _pick_person(rng) -> str:
    return R.PERSONS[_skew_index(rng, len(R.PERSONS))]


def _tense(rng, present: str, past: str) -> str:
    """v24: ~15% of alternating-family sentences realize the past form."""
    return past if rng.random() < 0.15 else present


def _aspect_verb(rng, present: str, past: str, part_ing: str) -> str:
    """v27: ~15% simple past, ~7% progressive (is/was + V-ing), ~7%
    perfect (has/had + V-ed; the participle equals the regular past
    form), rest simple present.  The auxiliary choice composes tense
    with aspect ('was working' = past progressive, 'has worked' =
    present perfect — the PRES_PERFECT_RE carve-out keeps it
    non-past)."""
    u = rng.random()
    if u < 0.15:
        return past
    if u < 0.22:
        return ("was " if rng.random() < 0.5 else "is ") + part_ing
    if u < 0.29:
        return ("had " if rng.random() < 0.5 else "has ") + past
    return present


def _since_suffix(rng, verb: str) -> str:
    """v33: ~50% of PERFECT verb groups ('has/had/have V-ed') carry the
    sentence-final temporal adjunct (' since <year>') — the adjunct
    pairs with the perfect aspect only (natural English: 'has worked at
    Acme since 2019'); the attribute kernels are lexical, so the engine
    contract stays total on any since-suffixed form.  Years are drawn
    from [2005, 2024], inside rules.SINCE_RE's [12][0-9]{3} class."""
    if verb.startswith(("has ", "had ", "have ")) and rng.random() < 0.5:
        return f" since {2005 + int(rng.integers(0, 20))}"
    return ""


def _hedge(rng) -> str:
    """v36: ~5% of sentences of the hedge-accepting families carry the
    'reportedly' adverb before the (optional) negation/verb group —
    rules.HEDGE_OPT; the hedged attribute kernel is the NEGATION_MARK
    substring discipline."""
    return "reportedly " if rng.random() < 0.05 else ""


def _aspect_past_verb(rng, past: str, part_ing: str) -> str:
    """v29: aspect forms for an intrinsically-past verb family (the
    ditransitive 'introduced'): ~7% progressive (is/was + V-ing), ~7%
    perfect (has/had + V-ed), rest the bare past — there is no simple
    present in these families."""
    u = rng.random()
    if u < 0.07:
        return ("was " if rng.random() < 0.5 else "is ") + part_ing
    if u < 0.14:
        return ("had " if rng.random() < 0.5 else "has ") + past
    return past


def _passive_cop(rng) -> str:
    """v31: the passive auxiliary chain — ~15% simple past ('was'),
    ~7% progressive ('is/was being'), ~7% perfect ('has/had been'),
    rest simple present ('is').  Composes with the participle already
    in the template text ('... maintained by <person>'); tense rides
    the auxiliary exactly as in the active families."""
    u = rng.random()
    if u < 0.15:
        return "was"
    if u < 0.22:
        return ("was being" if rng.random() < 0.5 else "is being")
    if u < 0.29:
        return ("had been" if rng.random() < 0.5 else "has been")
    return "is"


def _aspect_verb_pl(rng, present: str, past: str, part_ing: str) -> str:
    """v30: full plural aspect alternation for coordinated subjects
    ('Alice and Bob are working at X' / 'have worked at X') — the
    plural analog of _aspect_verb, using the are/were/have auxiliaries
    the v29 reciprocal added to the kernels."""
    u = rng.random()
    if u < 0.15:
        return past
    if u < 0.22:
        return ("were " if rng.random() < 0.5 else "are ") + part_ing
    if u < 0.29:
        return ("had " if rng.random() < 0.5 else "have ") + past
    return present


def _aspect_past_verb_pl(rng, past: str, part_ing: str) -> str:
    """v29: the PLURAL-subject variant (the reciprocal 'met' under a
    coordinated subject) — the progressive copula is are/were and the
    perfect auxiliary have/had, which is why rules.PROG_RE / PAST_RE /
    PRES_PERFECT_RE carry those tokens."""
    u = rng.random()
    if u < 0.07:
        return ("were " if rng.random() < 0.5 else "are ") + part_ing
    if u < 0.14:
        return ("had " if rng.random() < 0.5 else "have ") + past
    return past


def _pick_org(rng) -> tuple[str, str]:
    """Returns (surface, canonical). 15% of surfaces carry a deterministic
    typo (doubled last letter) so fuzzy MinHash linking is exercised."""
    base = R.ORG_BASES[_skew_index(rng, len(R.ORG_BASES))]
    variant = base + base[-1] if rng.random() < 0.15 else base
    suffix = R.ORG_SUFFIXES[int(rng.integers(0, len(R.ORG_SUFFIXES)))]
    return f"{variant} {suffix}", base.lower()


def _works_at_commits(text: str) -> dict[str, str]:
    """Turn-level org-engineer state commits (v28): scan the turn's text
    with the SHARED works_at templates (single / multi / list arms) and
    return {normalized org surface -> max explicit subject} — exactly the
    engine contract, so descriptor generation can never disagree with
    resolution.  Pronoun subjects never commit (the standard rule)."""
    out: dict[str, str] = {}

    def upd(subj: str, obj_surface: str) -> None:
        if subj in R.SUBJ_PRONOUNS:
            return
        key = R.normalize_surface("org", obj_surface)
        m = out.get(key)
        if m is None or subj > m:
            out[key] = subj

    for sent in R.split_sentences(text):
        matched = False
        for pred, rx, sk, ok in R.COMPILED_TEMPLATES:
            m = rx.match(sent)
            if m is None:
                continue
            if pred == "works_at":
                upd(m.group("subj"), m.group("obj"))
            matched = True
            break
        if matched:
            continue
        for name, rx, emissions in R.COMPILED_MULTI_TEMPLATES:
            m = rx.match(sent)
            if m is None:
                continue
            for pred, sg, sk, og, ok, slot, clause in emissions:
                if pred == "works_at" and ok == "org":
                    upd(m.group(sg), m.group(og))
            matched = True
            break
        if matched:
            continue
        for name, rx, pred, mk, ok, clause in R.COMPILED_LIST_TEMPLATES:
            m = rx.match(sent)
            if m is None:
                continue
            if pred == "works_at" and ok == "org":
                for mem in (m.group("list").split(R.LIST_SEP)
                            + [m.group("last")]):
                    upd(mem, m.group("obj"))
            break
    return out


def gen_conversation(conv_idx: int) -> tuple[list[dict], list[dict]]:
    """Pure per-conversation generator → (transcript rows, ground-truth triples)."""
    rng = np.random.default_rng((SEED, conv_idx))
    conv_id = f"conv{conv_idx:08d}"
    n = int(rng.integers(6, 27))
    rows: list[dict] = []
    gts: list[dict] = []
    last_person: str | None = None  # surface form
    # typed surfaces seen so far in THIS conversation — the draw pool for
    # same-conv "mentioned" turns (kind recovery's round-1 regime); a
    # SAMPLE of the conv's evidence, not an exhaustive mirror
    conv_ev: list[tuple[str, str, str]] = []   # (surface, kind, canonical)

    # committed normalized-org-surface -> engineer (v28 descriptor state);
    # updated at add_row via the shared-template scan, so it can never
    # disagree with the engine's works_at-derived state
    last_eng: dict[str, str] = {}

    def add_row(t, role, text, tool=None):
        rows.append(dict(
            conv_id=conv_id, turn_idx=t, role=role, text=text, tool=tool,
            ts=(BASE_EPOCH + conv_idx * 3600 + t * 7) * 1_000_000,
        ))
        # ' work' is implied by every works_at verb form (works / worked /
        # is|was working / has|had worked) — cheap gate before the scan
        if role != "tool" and " work" in text:
            c = _works_at_commits(text)
            if c:
                last_eng.update(c)

    def add_gt(t, sk, s, p, ok, o):
        gts.append(dict(conv_id=conv_id, turn_idx=t, subj_kind=sk, subj=s,
                        pred=p, obj_kind=ok, obj=o))

    def gen_multi_sentence(rng, allow_quoted: bool):
        """One MULTI-relation sentence (coordination / appositive /
        relative clause / quoted speech) → (text, [gt tuples],
        person_slot_surface).  person_slot mirrors the engine contract:
        max over each emitted row's person contribution (obj shadows
        subj per row)."""
        kinds = ["coord_works_at", "coord_uses", "appos_maintainer",
                 "relative_manages", "passive_maintains",
                 "possessive_manager", "coord_orgs", "coord3_works_at",
                 "coordN_works_at", "vp_coord_maintains_uses",
                 "postposed_quoted_uses", "ditrans_introduced",
                 "recip_met"] \
            + (["quoted_uses", "quoted_coord_uses",
                "quoted_ditrans_introduced",
                "quoted_multi_uses_maintains"] if allow_quoted else [])
        kind = kinds[int(rng.integers(0, len(kinds)))]
        end = "?" if (rng.random() < 0.05
                      and kind not in ("quoted_uses", "quoted_coord_uses",
                                       "postposed_quoted_uses",
                                       "quoted_ditrans_introduced",
                                       "quoted_multi_uses_maintains")) \
            else "."
        if kind == "coord_works_at":
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            obj_surface, obj_canon = _pick_org(rng)
            verb = _aspect_verb_pl(rng, "work", "worked", "working")
            text = f"{a} and {b} {_hedge(rng)}{verb} at {obj_surface}{end}"
            gts = [("person", a.lower(), "works_at", "org", obj_canon),
                   ("person", b.lower(), "works_at", "org", obj_canon)]
            return text, gts, max(a, b)
        if kind == "coord_uses":
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            verb = _aspect_verb_pl(rng, "use", "used", "using")
            text = f"{a} and {b} {_hedge(rng)}{verb} {tool} daily{end}"
            gts = [("person", a.lower(), "uses", "tool", tool),
                   ("person", b.lower(), "uses", "tool", tool)]
            return text, gts, max(a, b)
        if kind == "appos_maintainer":
            a = _pick_person(rng)
            mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            obj_surface, obj_canon = _pick_org(rng)
            neg = "no longer " if rng.random() < 0.08 else ""
            text = (f"{a}, the maintainer of {mod}, {neg}works at "
                    f"{obj_surface}{end}")
            gts = [("person", a.lower(), "maintains", "module", mod),
                   ("person", a.lower(), "works_at", "org", obj_canon)]
            return text, gts, a
        if kind == "relative_manages":
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            obj_surface, obj_canon = _pick_org(rng)
            text = f"{a}, who manages {b}, joined {obj_surface}{end}"
            gts = [("person", a.lower(), "manages", "person", b.lower()),
                   ("person", a.lower(), "joined", "org", obj_canon)]
            return text, gts, max(a, b)
        if kind == "passive_maintains":
            a = _pick_person(rng)
            mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            cop = _passive_cop(rng)
            text = f"{mod} {_hedge(rng)}{cop} maintained by {a}{end}"
            gts = [("person", a.lower(), "maintains", "module", mod)]
            return text, gts, a   # subj person commits (obj not a person)
        if kind == "coord_orgs":
            a = _pick_person(rng)
            o1s, o1c = _pick_org(rng)
            o2s, o2c = _pick_org(rng)
            while o2c == o1c:
                o2s, o2c = _pick_org(rng)
            text = f"{a} works at both {o1s} and {o2s}{end}"
            gts = [("person", a.lower(), "works_at", "org", o1c),
                   ("person", a.lower(), "works_at", "org", o2c)]
            return text, gts, a
        if kind == "coordN_works_at":
            # open-ended coordination list (v12): 4-6 distinct names; one
            # works_at emission per member, slot_idx = list position
            k = int(rng.integers(4, 7))
            names: list[str] = []
            while len(names) < k:
                q = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                if q not in names:
                    names.append(q)
            obj_surface, obj_canon = _pick_org(rng)
            verb = _aspect_verb_pl(rng, "work", "worked", "working")
            text = (f"{', '.join(names[:-1])} and {names[-1]} "
                    f"{_hedge(rng)}{verb} at {obj_surface}{end}")
            gts = [("person", nm.lower(), "works_at", "org", obj_canon)
                   for nm in names]
            return text, gts, max(names)
        if kind == "coord3_works_at":
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            c = _pick_person(rng)
            while c in (a, b):
                c = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            obj_surface, obj_canon = _pick_org(rng)
            verb = _aspect_verb_pl(rng, "work", "worked", "working")
            text = f"{a}, {b} and {c} {_hedge(rng)}{verb} at {obj_surface}{end}"
            gts = [("person", a.lower(), "works_at", "org", obj_canon),
                   ("person", b.lower(), "works_at", "org", obj_canon),
                   ("person", c.lower(), "works_at", "org", obj_canon)]
            return text, gts, max(a, b, c)
        if kind == "quoted_coord_uses":
            # coordination nested inside quoted speech — must be the FINAL
            # sentence of its turn (the '."' terminator carries no boundary)
            speaker = _pick_person(rng)
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            verb = _aspect_verb_pl(rng, "use", "used", "using")
            text = f'{speaker} said "{a} and {b} {verb} {tool} daily."'
            gts = [("person", a.lower(), "uses", "tool", tool),
                   ("person", b.lower(), "uses", "tool", tool)]
            return text, gts, max(a, b)
        if kind == "vp_coord_maintains_uses":
            # VP coordination (v19): one subject, two relations; the
            # explicit subject both commits referent state and feeds the
            # module-keyed descriptor state via its maintains emission
            a = _pick_person(rng)
            mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            text = f"{a} maintains {mod} and uses {tool} daily{end}"
            gts = [("person", a.lower(), "maintains", "module", mod),
                   ("person", a.lower(), "uses", "tool", tool)]
            return text, gts, a
        if kind == "ditrans_introduced":
            # ditransitive (v20): one verb, three NP slots — TWO
            # emissions of the same relation (direct object slot 0,
            # recipient slot 1); both object persons feed referent state
            # (per-row obj-shadows-subj, turn max ⇒ max(b, c))
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            c = _pick_person(rng)
            while c in (a, b):
                c = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            verb = _aspect_past_verb(rng, "introduced", "introducing")
            text = f"{a} {_hedge(rng)}{verb} {b} to {c}{end}"
            gts = [("person", a.lower(), "introduced", "person", b.lower()),
                   ("person", a.lower(), "introduced", "person", c.lower())]
            return text, gts, max(b, c)
        if kind == "quoted_multi_uses_maintains":
            # MULTI-SENTENCE quoted speech (v23): the quote-aware
            # splitter keeps the whole quotation as ONE sentence; both
            # inner relations emit with clause 'quoted'.  Explicit
            # variant: both inner subjects feed referent state (per-row
            # max), and the maintains subject feeds the module-keyed
            # descriptor state via track_maint at the callsites (state
            # selection is by predicate, not construct).  Turn-final
            # only, like every '."'-terminated quote.
            speaker = _pick_person(rng)
            a = _pick_person(rng)
            b = _pick_person(rng)
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            text = (f'{speaker} said "{a} uses {tool} daily. '
                    f'{b} maintains {mod}."')
            gts = [("person", a.lower(), "uses", "tool", tool),
                   ("person", b.lower(), "maintains", "module", mod)]
            return text, gts, max(a, b)
        if kind == "quoted_ditrans_introduced":
            # ditransitive nested in quoted speech (v22): the speaker is
            # not an emitted slot; both person objects feed state
            speaker = _pick_person(rng)
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            c = _pick_person(rng)
            while c in (a, b):
                c = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            verb = _aspect_past_verb(rng, "introduced", "introducing")
            text = f'{speaker} said "{a} {verb} {b} to {c}."'
            gts = [("person", a.lower(), "introduced", "person", b.lower()),
                   ("person", a.lower(), "introduced", "person", c.lower())]
            return text, gts, max(b, c)
        if kind == "recip_met":
            # reciprocal coordination (v21): symmetric verb — the
            # relation emits in BOTH directions; each row's person
            # contribution is its object, so the turn referent is
            # max(a, b) exactly as for explicit coordination
            a = _pick_person(rng)
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            verb = _aspect_past_verb_pl(rng, "met", "meeting")
            text = f"{a} and {b} {_hedge(rng)}{verb}{end}"
            gts = [("person", a.lower(), "met", "person", b.lower()),
                   ("person", b.lower(), "met", "person", a.lower())]
            return text, gts, max(a, b)
        if kind == "postposed_quoted_uses":
            # postposed attribution (v19): plain '.' terminator, so the
            # sentence needs NO turn-final placement (unlike quoted_uses)
            speaker = _pick_person(rng)
            d = _pick_person(rng)
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            text = f'"{d} uses {tool} daily," said {speaker}.'
            gts = [("person", d.lower(), "uses", "tool", tool)]
            return text, gts, d
        if kind == "possessive_manager":
            a = _pick_person(rng)          # manager = relation subject
            b = _pick_person(rng)
            while b == a:
                b = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            cop = _tense(rng, "is", "was")
            text = f"{b}'s manager {cop} {a}{end}"
            gts = [("person", a.lower(), "manages", "person", b.lower())]
            return text, gts, b   # obj person shadows subj (slot contract)
        # quoted_uses — must be the FINAL sentence of its turn (the '."'
        # terminator carries no sentence boundary)
        speaker = _pick_person(rng)
        d = _pick_person(rng)
        tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
        verb = _aspect_verb(rng, "uses", "used", "using")
        text = f'{speaker} said "{d} {_hedge(rng)}{verb} {tool} daily."'
        gts = [("person", d.lower(), "uses", "tool", tool)]
        return text, gts, d

    def gen_sentence(rng, allow_quoted: bool = True):
        """One template sentence → (text, [gt tuples], person_slot_surface).
        Modifiers: 8% 'no longer' (works_at/uses), 5% '?' terminator —
        exercised so the attributed-triples path has real positives.
        15% of sentences are multi-relation constructs."""
        if rng.random() < 0.15:
            return gen_multi_sentence(rng, allow_quoted)
        ti = int(rng.integers(0, len(R.TEMPLATES)))
        pred, _, sk, ok = R.TEMPLATES[ti]
        person_slot = None
        neg = ""
        if pred in ("works_at", "uses") and rng.random() < 0.08:
            neg = "no longer "
        end = "?" if rng.random() < 0.05 else "."
        if pred == "works_at":
            subj = _pick_person(rng)
            obj_surface, obj_canon = _pick_org(rng)
            # v27: aspect forms only without the negation modifier ('no
            # longer is working' is not generated; the regex would still
            # match it, so the contract stays total either way)
            verb = (_tense(rng, "works", "worked") if neg
                    else _aspect_verb(rng, "works", "worked", "working"))
            text = (f"{subj} {_hedge(rng)}{neg}{verb} at {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            subj_canon = subj.lower()
            person_slot = subj
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "org", obj_canon)])
        elif pred == "reported_bug":
            subj = _pick_person(rng)
            obj_surface = obj_canon = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            text = f"{subj} reported a bug in {obj_surface}{end}"
            subj_canon = subj.lower()
            person_slot = subj
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "module", obj_canon)])
        elif pred == "uses":
            subj = _pick_person(rng)
            obj_surface = obj_canon = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            verb = (_tense(rng, "uses", "used") if neg
                    else _aspect_verb(rng, "uses", "used", "using"))
            text = (f"{subj} {_hedge(rng)}{neg}{verb} {obj_surface} daily"
                    f"{_since_suffix(rng, verb)}{end}")
            subj_canon = subj.lower()
            person_slot = subj
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "tool", obj_canon)])
        elif pred == "acquired":
            s_surface, subj_canon = _pick_org(rng)
            obj_surface, obj_canon = _pick_org(rng)
            while obj_canon == subj_canon:
                obj_surface, obj_canon = _pick_org(rng)
            # v35: the intrinsically-past org families alternate aspect
            verb = _aspect_past_verb(rng, "acquired", "acquiring")
            text = (f"{s_surface} {verb} {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            conv_ev.extend([(s_surface, "org", subj_canon),
                        (obj_surface, "org", obj_canon)])
        elif pred in ("met", "manages"):
            # v35: 'met with' gains the singular aspect alternation
            # ('is/was meeting with', 'has/had met with')
            verb = (_aspect_past_verb(rng, "met", "meeting") + " with"
                    if pred == "met"
                    else _aspect_verb(rng, "manages", "managed",
                                      "managing"))
            subj = _pick_person(rng)
            obj_surface = _pick_person(rng)
            while obj_surface == subj:
                obj_surface = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
            obj_canon = obj_surface.lower()
            # v36: only manages accepts the hedge adverb (met's template
            # was not extended)
            hedge = _hedge(rng) if pred == "manages" else ""
            text = (f"{subj} {hedge}{verb} {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            subj_canon = subj.lower()
            person_slot = obj_surface  # object is the later person slot
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "person", obj_canon)])
        elif pred in ("joined", "left_org"):
            # v35 aspect alternation ('is joining' / 'has left' ...)
            verb = (_aspect_past_verb(rng, "joined", "joining")
                    if pred == "joined"
                    else _aspect_past_verb(rng, "left", "leaving"))
            subj = _pick_person(rng)
            obj_surface, obj_canon = _pick_org(rng)
            text = (f"{subj} {verb} {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            subj_canon = subj.lower()
            person_slot = subj
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "org", obj_canon)])
        elif pred == "maintains":
            subj = _pick_person(rng)
            obj_surface = obj_canon = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
            verb = _aspect_verb(rng, "maintains", "maintained",
                                "maintaining")
            text = (f"{subj} {_hedge(rng)}{verb} {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            subj_canon = subj.lower()
            person_slot = subj
            conv_ev.extend([(subj, "person", subj_canon),
                        (obj_surface, "module", obj_canon)])
        else:  # partnered
            s_surface, subj_canon = _pick_org(rng)
            obj_surface, obj_canon = _pick_org(rng)
            while obj_canon == subj_canon:
                obj_surface, obj_canon = _pick_org(rng)
            verb = _aspect_past_verb(rng, "partnered", "partnering")
            text = (f"{s_surface} {verb} with {obj_surface}"
                    f"{_since_suffix(rng, verb)}{end}")
            conv_ev.extend([(s_surface, "org", subj_canon),
                        (obj_surface, "org", obj_canon)])
        return text, [(sk, subj_canon, pred, ok, obj_canon)], person_slot

    # committed module -> maintainer (canonical), mirroring the engine's
    # definite-description state: per-turn max, committed at the turn
    # boundary (each turn is fully generated before the next, so updating
    # after a turn's gts are known gives exactly strictly-earlier-turn state)
    last_maint: dict[str, str] = {}

    def track_maint(turn_gts: list[tuple]) -> None:
        turn_m: dict[str, str] = {}
        for (sk2, s2, p2, ok2, o2) in turn_gts:
            # v16: the state family is generic — explicit maintains
            # (module-keyed) AND manages (person-keyed) events commit;
            # key spaces are disjoint (modules carry a dot)
            if p2 in ("maintains", "manages"):
                m = turn_m.get(o2)
                if m is None or s2 > m:
                    turn_m[o2] = s2
        last_maint.update(turn_m)

    t = 0
    while t < n:
        role = "user" if t % 2 == 0 else "assistant"
        r = rng.random()
        if r < 0.12 and last_person is not None:
            u = rng.random()
            if 0.25 <= u < 0.45:
                # OBJECT-side pronoun turn: "X met with her." / "X manages
                # him." — the pronoun resolves to the committed referent;
                # the explicit subject commits the new state
                subj = _pick_person(rng)
                while subj == last_person:
                    subj = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                if rng.random() < 0.25:
                    # PRONOUN-IN-APPOSITIVE (v25): "Bob, her manager,
                    # joined Initech." — the appositive's lowercase
                    # pronoun resolves to the committed referent
                    # (manages(Bob, ref), clause 'appositive'); the main
                    # clause emits joined(Bob, org).  Both emissions'
                    # explicit subject commits the new referent; the
                    # pronoun-RESOLVED manages row feeds no
                    # manager-descriptor state (the v12 discipline).
                    pron2 = ("her", "his")[int(rng.integers(0, 2))]
                    org_surface, org_canon = _pick_org(rng)
                    add_row(t, role,
                            f"{subj}, {pron2} manager, joined "
                            f"{org_surface}.")
                    add_gt(t, "person", subj.lower(), "manages",
                           "person", last_person.lower())
                    add_gt(t, "person", subj.lower(), "joined",
                           "org", org_canon)
                    last_person = subj
                    t += 1
                    continue
                pron = ("her", "him")[int(rng.integers(0, 2))]
                pred2 = ("met", "manages")[int(rng.integers(0, 2))]
                verb = "met with" if pred2 == "met" else "manages"
                if rng.random() < 0.3:
                    # object pronoun NESTED in quoted speech (v18):
                    # quoting-turn scope; the speaker is not an emitted
                    # slot — same GT as the plain construct
                    speaker = _pick_person(rng)
                    add_row(t, role,
                            f'{speaker} said "{subj} {verb} {pron}."')
                else:
                    add_row(t, role, f"{subj} {verb} {pron}.")
                add_gt(t, "person", subj.lower(), pred2,
                       "person", last_person.lower())
                last_person = subj
                t += 1
                continue
            if u < 0.25:
                # pronoun INSIDE a coordinated construct ("She and Bob work
                # at X" / "Bob and She use y daily"): the pronoun slot
                # resolves to the committed referent with the emission's
                # slot_idx; the non-pronoun partner commits the new state
                pronoun = R.PRONOUNS[int(rng.integers(0, 2))]
                partner = _pick_person(rng)
                variant = int(rng.integers(0, 6))
                if variant == 5:
                    # pronoun member in a RECIPROCAL coordination (v21):
                    # 'She and Bob met.' — one pronoun-SUBJECT emission
                    # met(ref, Bob) and one OBJECT-pronoun emission
                    # met(Bob, ref); the object-pronoun row's explicit
                    # subject (the partner) feeds state
                    p2 = _pick_person(rng)
                    while p2 == last_person:
                        p2 = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                    first, second = ((pronoun, p2) if rng.random() < 0.5
                                     else (p2, pronoun))
                    add_row(t, role, f"{first} and {second} met.")
                    add_gt(t, "person", last_person.lower(), "met",
                           "person", p2.lower())
                    add_gt(t, "person", p2.lower(), "met",
                           "person", last_person.lower())
                    last_person = p2
                    t += 1
                    continue
                if variant == 4:
                    # pronoun-subject DITRANSITIVE (v20): both emissions
                    # share the pronoun subject and resolve to the
                    # committed referent; resolved rows feed no state and
                    # there is no partner SUBJECT slot, so the referent
                    # carries over unchanged
                    b2 = _pick_person(rng)
                    c2 = _pick_person(rng)
                    while c2 == b2:
                        c2 = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                    add_row(t, role, f"{pronoun} introduced {b2} to {c2}.")
                    add_gt(t, "person", last_person.lower(), "introduced",
                           "person", b2.lower())
                    add_gt(t, "person", last_person.lower(), "introduced",
                           "person", c2.lower())
                    t += 1
                    continue
                if variant == 3:
                    # pronoun inside a 4-way coordination LIST (v12): the
                    # pronoun slot resolves to the committed referent with
                    # its list position; every explicit member commits
                    partners: list[str] = []
                    while len(partners) < 3:
                        q = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                        if q not in partners:
                            partners.append(q)
                    obj_surface, obj_canon = _pick_org(rng)
                    names = partners.copy()
                    names.insert(int(rng.integers(0, 4)), pronoun)
                    text = (f"{names[0]}, {names[1]}, {names[2]} and "
                            f"{names[3]} work at {obj_surface}.")
                    add_row(t, role, text)
                    add_gt(t, "person", last_person.lower(), "works_at",
                           "org", obj_canon)
                    for q in partners:
                        add_gt(t, "person", q.lower(), "works_at",
                               "org", obj_canon)
                    last_person = max(partners)
                    t += 1
                    continue
                if variant == 2:
                    tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
                    text = f"{pronoun} and {partner} use {tool} daily."
                    pred2, ok2, oc = "uses", "tool", tool
                else:
                    obj_surface, obj_canon = _pick_org(rng)
                    first, second = ((pronoun, partner) if variant == 0
                                     else (partner, pronoun))
                    text = f"{first} and {second} work at {obj_surface}."
                    pred2, ok2, oc = "works_at", "org", obj_canon
                add_row(t, role, text)
                add_gt(t, "person", last_person.lower(), pred2, ok2, oc)
                add_gt(t, "person", partner.lower(), pred2, ok2, oc)
                last_person = partner
                t += 1
                continue
            if 0.45 <= u < 0.60:
                # pronoun INSIDE quoted speech (v11): resolves in the
                # QUOTING turn's scope — the committed referent of the
                # latest earlier turn; the SPEAKER is not an emitted slot
                # (no state commit, no shadowing).  Half the draws nest a
                # coordination inside the quote ('X said "She and Bob use
                # y daily."') — the non-pronoun partner DOES commit state.
                speaker = _pick_person(rng)
                pronoun = R.PRONOUNS[int(rng.integers(0, 2))]
                tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
                u4 = rng.random()
                if u4 < 0.4:
                    text = f'{speaker} said "{pronoun} uses {tool} daily."'
                    add_row(t, role, text)
                    add_gt(t, "person", last_person.lower(), "uses",
                           "tool", tool)
                elif u4 < 0.55:
                    # MULTI-SENTENCE quote with the pronoun in the SECOND
                    # inner sentence (v23): intra-quote anaphora resolves
                    # in the QUOTING turn's scope — the committed referent
                    # of earlier turns, NOT the first inner subject d.
                    # d (explicit uses subject) commits the new referent;
                    # the pronoun-RESOLVED maintains row feeds no
                    # maintainer state (the descriptor-state contract)
                    d = _pick_person(rng)
                    while d == last_person:
                        d = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                    mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
                    add_row(t, role,
                            f'{speaker} said "{d} uses {tool} daily. '
                            f'{pronoun} maintains {mod}."')
                    add_gt(t, "person", d.lower(), "uses", "tool", tool)
                    add_gt(t, "person", last_person.lower(), "maintains",
                           "module", mod)
                    last_person = d
                elif u4 < 0.63:
                    # v26: pronoun in the FIRST inner sentence, explicit
                    # second subject — the pronoun resolves in the quoting
                    # turn's scope; the EXPLICIT maintains subject commits
                    # the new referent AND feeds the module-keyed
                    # descriptor state (state selection is by predicate)
                    d = _pick_person(rng)
                    while d == last_person:
                        d = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                    mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
                    add_row(t, role,
                            f'{speaker} said "{pronoun} uses {tool} daily. '
                            f'{d} maintains {mod}."')
                    add_gt(t, "person", last_person.lower(), "uses",
                           "tool", tool)
                    add_gt(t, "person", d.lower(), "maintains",
                           "module", mod)
                    track_maint([("person", d.lower(), "maintains",
                                  "module", mod)])
                    last_person = d
                elif u4 < 0.7:
                    # v26: pronoun CHAIN — BOTH inner subjects are
                    # pronouns; each resolves independently in the quoting
                    # turn's scope (no intra-quote binding), so the chain
                    # co-refers to the same committed referent.  Resolved
                    # rows commit nothing: the referent carries over
                    # unchanged and no maintainer state is fed.
                    pron2 = R.PRONOUNS[int(rng.integers(0, 2))]
                    mod = R.MODULES[int(rng.integers(0, len(R.MODULES)))]
                    add_row(t, role,
                            f'{speaker} said "{pronoun} uses {tool} daily. '
                            f'{pron2} maintains {mod}."')
                    add_gt(t, "person", last_person.lower(), "uses",
                           "tool", tool)
                    add_gt(t, "person", last_person.lower(), "maintains",
                           "module", mod)
                else:
                    partner = _pick_person(rng)
                    while partner == last_person:
                        partner = R.PERSONS[
                            int(rng.integers(0, len(R.PERSONS)))]
                    text = (f'{speaker} said "{pronoun} and {partner} '
                            f'use {tool} daily."')
                    add_row(t, role, text)
                    add_gt(t, "person", last_person.lower(), "uses",
                           "tool", tool)
                    add_gt(t, "person", partner.lower(), "uses",
                           "tool", tool)
                    last_person = partner
                t += 1
                continue
            ti = int(rng.integers(0, len(R.PRONOUN_TEMPLATES)))
            pred, _, obj_kind = R.PRONOUN_TEMPLATES[ti]
            if pred == "managed_by":
                pronoun = R.POSS_PRONOUNS[int(rng.integers(0, 2))]
                other = _pick_person(rng)
                while other == last_person:
                    other = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                cop = _tense(rng, "is", "was")
                text = f"{pronoun} manager {cop} {other}."
                add_row(t, role, text)
                add_gt(t, "person", last_person.lower(), pred,
                       "person", other.lower())
                t += 1
                continue
            pronoun = R.PRONOUNS[int(rng.integers(0, 2))]
            neg = "no longer " if rng.random() < 0.08 else ""
            if obj_kind == "org":
                obj_surface, obj_canon = _pick_org(rng)
                verb = (_tense(rng, "works", "worked") if neg
                        else _aspect_verb(rng, "works", "worked",
                                          "working"))
                text = (f"{pronoun} {_hedge(rng)}{neg}{verb} "
                        f"at {obj_surface}{_since_suffix(rng, verb)}.")
                pred = "works_at"
            else:
                obj_surface = obj_canon = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
                verb = (_tense(rng, "uses", "used") if neg
                        else _aspect_verb(rng, "uses", "used", "using"))
                text = (f"{pronoun} {_hedge(rng)}{neg}{verb} "
                        f"{obj_surface} daily{_since_suffix(rng, verb)}.")
                pred = "uses"
            add_row(t, role, text)
            add_gt(t, "person", last_person.lower(), pred, obj_kind, obj_canon)
        elif r < 0.145 and t + 1 < n:
            # v32 PLURAL-PRONOUN pair: a coordination turn establishing a
            # KNOWN person set, then an adjacent "They ..." turn that
            # resolves to exactly that set (the anchor turn is the
            # immediately-preceding turn by construction, so the tracked
            # set can never disagree with the engine).  ~30% of pairs
            # chain a SECOND plural turn — resolved rows feed no state,
            # so the set carries over (the co-reference contract).
            k = int(rng.integers(2, 5))   # 2-4 coordinated members
            members: list[str] = []
            while len(members) < k:
                q = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                if q not in members:
                    members.append(q)
            org_surface, org_canon = _pick_org(rng)
            verb = _aspect_verb_pl(rng, "work", "worked", "working")
            head = (f"{members[0]} and {members[1]}" if k == 2
                    else ", ".join(members[:-1]) + f" and {members[-1]}")
            add_row(t, role, f"{head} {verb} at {org_surface}.")
            for mem in members:
                add_gt(t, "person", mem.lower(), "works_at",
                       "org", org_canon)
            t += 1
            n_plu = 2 if rng.random() < 0.3 else 1
            for _ in range(n_plu):
                if t >= n:
                    break
                role2 = "user" if t % 2 == 0 else "assistant"
                neg = "no longer " if rng.random() < 0.08 else ""
                u2 = rng.random()
                if u2 < 0.3:
                    # v34 plural reciprocal: "They met." — GT is every
                    # ORDERED pair of distinct members (the quadratic
                    # fan-out; resolved rows feed no state, so a
                    # following plural turn still sees the same set)
                    verb2 = _aspect_past_verb_pl(rng, "met", "meeting")
                    add_row(t, role2, f"They {_hedge(rng)}{verb2}.")
                    for a in members:
                        for b in members:
                            if b != a:
                                add_gt(t, "person", a.lower(), "met",
                                       "person", b.lower())
                elif u2 < 0.65:
                    tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
                    verb2 = (_tense(rng, "use", "used") if neg
                             else _aspect_verb_pl(rng, "use", "used",
                                                  "using"))
                    add_row(t, role2,
                            f"They {_hedge(rng)}{neg}{verb2} {tool} daily"
                            f"{_since_suffix(rng, verb2)}.")
                    for mem in members:
                        add_gt(t, "person", mem.lower(), "uses",
                               "tool", tool)
                else:
                    o2s, o2c = _pick_org(rng)
                    verb2 = (_tense(rng, "work", "worked") if neg
                             else _aspect_verb_pl(rng, "work", "worked",
                                                  "working"))
                    add_row(t, role2,
                            f"They {_hedge(rng)}{neg}{verb2} at {o2s}"
                            f"{_since_suffix(rng, verb2)}.")
                    for mem in members:
                        add_gt(t, "person", mem.lower(), "works_at",
                               "org", o2c)
                t += 1
            last_person = max(members)
            continue
        elif r < 0.165 and t + 1 < n:
            # v38 ORG-PRONOUN pair: a single-sentence works_at turn
            # commits a KNOWN org (its object is the turn's only org
            # slot), then an adjacent "It ..." turn resolves to exactly
            # that surface.  ~30% of pairs chain a SECOND "It" turn —
            # resolved rows feed no org state, so the referent carries
            # over (the co-reference contract).
            anchor_p = _pick_person(rng)
            org_surface, org_canon = _pick_org(rng)
            add_row(t, role, f"{anchor_p} works at {org_surface}.")
            add_gt(t, "person", anchor_p.lower(), "works_at",
                   "org", org_canon)
            last_person = anchor_p
            t += 1
            n_it = 2 if rng.random() < 0.3 else 1
            for _ in range(n_it):
                if t >= n:
                    break
                role2 = "user" if t % 2 == 0 else "assistant"
                obj2_surface, obj2_canon = _pick_org(rng)
                while obj2_canon == org_canon:
                    obj2_surface, obj2_canon = _pick_org(rng)
                if rng.random() < 0.5:
                    verb2 = _aspect_past_verb(rng, "acquired",
                                              "acquiring")
                    pred2 = "acquired"
                    tail = ""
                else:
                    verb2 = _aspect_past_verb(rng, "partnered",
                                              "partnering")
                    pred2 = "partnered"
                    tail = " with"
                add_row(t, role2,
                        f"It {verb2}{tail} {obj2_surface}"
                        f"{_since_suffix(rng, verb2)}.")
                add_gt(t, "org", org_canon, pred2, "org", obj2_canon)
                t += 1
            continue
        elif r < 0.40:
            text, gts2, slot = gen_sentence(rng)
            add_row(t, role, text)
            for gt in gts2:
                add_gt(t, *gt)
            if slot is not None:
                last_person = slot
            track_maint(gts2)
        elif r < 0.45:
            # multi-sentence turn: filler + template, or two templates —
            # referent commit is turn-level, ties take the lexicographic max
            # (the engine/oracle resolution contract).  Quoted-speech
            # sentences may only appear in the FINAL slot (their '."'
            # terminator carries no sentence boundary).
            slots = []
            texts = []
            turn_gts: list[tuple] = []
            if rng.random() < 0.5:
                texts.append(R.FILLERS[int(rng.integers(0, len(R.FILLERS)))])
                s_text, gts2, slot = gen_sentence(rng)
                texts.append(s_text)
                for gt in gts2:
                    add_gt(t, *gt)
                turn_gts.extend(gts2)
                slots.append(slot)
            else:
                for last in (False, True):
                    s_text, gts2, slot = gen_sentence(
                        rng, allow_quoted=last)
                    texts.append(s_text)
                    for gt in gts2:
                        add_gt(t, *gt)
                    turn_gts.extend(gts2)
                    slots.append(slot)
            add_row(t, role, " ".join(texts))
            persons = [s for s in slots if s is not None]
            if persons:
                last_person = max(persons)
            track_maint(turn_gts)
        elif r < 0.58 and t + 1 < n:
            tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
            add_row(t, "assistant", f"Calling {tool} now.")
            n_items = int(rng.integers(1, 100))
            add_row(t + 1, "tool", f"result: ok ({n_items} items)", tool=tool)
            add_gt(t + 1, "conv", conv_id, R.INVOKED_PRED, "tool", tool)
            conv_ev.append((tool, "tool", tool))
            t += 2
            continue
        elif last_maint and rng.random() < 0.15:
            # CROSS-SENTENCE definite description (v12): "The maintainer of
            # <mod> met with <Y>." — the descriptor resolves against the
            # committed maintainer of <mod> from a strictly-earlier turn
            # (the dict mirrors the engine's turn-boundary commit); the
            # explicit person object commits referent state
            mods = sorted(k for k in last_maint if "." in k)
            mgrs = sorted(k for k in last_maint if "." not in k)
            if mgrs and (not mods or rng.random() < 0.30):
                # manager-family descriptors (v16): person-keyed state
                key = mgrs[int(rng.integers(0, len(mgrs)))]
                ks = key.capitalize()        # canonical -> surface
                u3 = rng.random()
                if u3 < 0.40:
                    other = _pick_person(rng)
                    add_row(t, role,
                            f"The manager of {ks} met with {other}.")
                    add_gt(t, "person", last_maint[key], "met",
                           "person", other.lower())
                    last_person = other
                elif u3 < 0.70:
                    obj_surface, obj_canon = _pick_org(rng)
                    add_row(t, role,
                            f"The manager of {ks} joined {obj_surface}.")
                    add_gt(t, "person", last_maint[key], "joined",
                           "org", obj_canon)
                elif u3 < 0.90:
                    # object-side manager descriptor: the explicit
                    # subject commits referent state
                    subj = _pick_person(rng)
                    add_row(t, role,
                            f"{subj} met with the manager of {ks}.")
                    add_gt(t, "person", subj.lower(), "met",
                           "person", last_maint[key])
                    last_person = subj
                else:
                    # manager descriptor NESTED in quoted speech (v17):
                    # quoting-turn scope; speaker not an emitted slot;
                    # the explicit person object commits referent state
                    speaker = _pick_person(rng)
                    other = _pick_person(rng)
                    add_row(t, role, f'{speaker} said "The manager of '
                                     f'{ks} met with {other}."')
                    add_gt(t, "person", last_maint[key], "met",
                           "person", other.lower())
                    last_person = other
                t += 1
                continue
            mod = mods[int(rng.integers(0, len(mods)))]
            u2 = rng.random()
            if u2 < 0.40:
                other = _pick_person(rng)
                add_row(t, role,
                        f"The maintainer of {mod} met with {other}.")
                add_gt(t, "person", last_maint[mod], "met",
                       "person", other.lower())
                last_person = other
            elif u2 < 0.65:
                # org-object descriptor (v13): the explicit object is an
                # org, so it feeds NO pronoun-referent state (the
                # kind-conditional feed rule)
                obj_surface, obj_canon = _pick_org(rng)
                add_row(t, role,
                        f"The maintainer of {mod} joined {obj_surface}.")
                add_gt(t, "person", last_maint[mod], "joined",
                       "org", obj_canon)
            elif u2 < 0.80:
                # descriptor NESTED in quoted speech (v14): resolves in
                # the quoting turn's scope; the speaker is not an emitted
                # slot (no commit, no shadowing); the explicit person
                # object inside the quote commits referent state
                speaker = _pick_person(rng)
                other = _pick_person(rng)
                add_row(t, role, f'{speaker} said "The maintainer of '
                                 f'{mod} met with {other}."')
                add_gt(t, "person", last_maint[mod], "met",
                       "person", other.lower())
                last_person = other
            elif u2 < 0.90:
                # tool-object descriptor (v14): kind-conditional feed —
                # the tool object commits no referent state
                tool = R.TOOLS[_skew_index(rng, len(R.TOOLS))]
                add_row(t, role,
                        f"The maintainer of {mod} uses {tool} daily.")
                add_gt(t, "person", last_maint[mod], "uses",
                       "tool", tool)
            else:
                # OBJECT-side definite description (v15): "X met with the
                # maintainer of <mod>." — the object resolves to the
                # committed maintainer; the explicit subject commits
                # referent state (the object-pronoun discipline)
                subj = _pick_person(rng)
                pred2 = ("met", "manages")[int(rng.integers(0, 2))]
                verb = "met with" if pred2 == "met" else "manages"
                add_row(t, role,
                        f"{subj} {verb} the maintainer of {mod}.")
                add_gt(t, "person", subj.lower(), pred2,
                       "person", last_maint[mod])
                last_person = subj
        elif last_eng and rng.random() < 0.12:
            # ORG-keyed descriptor turn (v28): "The <Base> engineer met
            # with X." — resolves against the committed normalized-surface
            # works_at state of strictly-earlier turns; the explicit
            # person object commits referent state (kind-conditional feed)
            keys = sorted(last_eng)
            key = keys[int(rng.integers(0, len(keys)))]
            ks = key.capitalize()
            if rng.random() < 0.55:
                other = _pick_person(rng)
                add_row(t, role, f"The {ks} engineer met with {other}.")
                add_gt(t, "person", last_eng[key].lower(), "met",
                       "person", other.lower())
                last_person = other
            else:
                obj_surface, obj_canon = _pick_org(rng)
                add_row(t, role,
                        f"The {ks} engineer joined {obj_surface}.")
                add_gt(t, "person", last_eng[key].lower(), "joined",
                       "org", obj_canon)
        elif rng.random() < 0.12:
            # untyped-mention turn (kind recovery's input, v10): three
            # regimes — same-conv evidence (round 1), global person
            # evidence (round 2; persons are globally typed in any
            # non-trivial corpus), never-typed surface (unrecoverable
            # stub, round 0 — NO ground-truth row: dropped before
            # canonicalization).  Not a template match: referent state and
            # every surface-grammar stream are untouched.
            subj = _pick_person(rng)
            u = rng.random()
            if u < 0.6 and conv_ev:
                surface, kind, canon = conv_ev[
                    int(rng.integers(0, len(conv_ev)))]
                add_gt(t, "person", subj.lower(), R.MENTIONED_PRED,
                       kind, canon)
            elif u < 0.85:
                other = R.PERSONS[int(rng.integers(0, len(R.PERSONS)))]
                surface = other
                add_gt(t, "person", subj.lower(), R.MENTIONED_PRED,
                       "person", other.lower())
            else:
                surface = R.NEVER_TYPED[
                    int(rng.integers(0, len(R.NEVER_TYPED)))]
            add_row(t, role, f"{subj} mentioned {surface}.")
        else:
            add_row(t, role, R.FILLERS[int(rng.integers(0, len(R.FILLERS)))])
        t += 1
    return rows, gts


def _rows_to_table(rows: list[dict], sch: pa.Schema) -> pa.Table:
    cols = {f.name: [r.get(f.name) for r in rows] for f in sch}
    return pa.Table.from_pydict(cols, schema=sch)


def n_convs_for_sf(sf: float) -> int:
    return max(32, int(125_000 * sf))


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.001


def generate_corpus(n_convs: int) -> tuple[pa.Table, pa.Table]:
    """Plain-loop generation (used for test scales; Ray path in sources/)."""
    rows: list[dict] = []
    gts: list[dict] = []
    for i in range(n_convs):
        r, g = gen_conversation(i)
        rows.extend(r)
        gts.extend(g)
    t = _rows_to_table(rows, S.TRANSCRIPTS)
    # deterministic row shuffle: the on-disk corpus must not rely on
    # conversation-contiguous layout (pipelines may not assume grouped input)
    perm = np.random.default_rng(SEED).permutation(t.num_rows)
    return t.take(pa.array(perm)), _rows_to_table(gts, GT_SCHEMA)


def corpus_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(CORPUS_ROOT, CORPUS_VERSION, name)


def ensure_corpus(sf_dir: str) -> str:
    """Idempotently materialize the corpus for a testdata sf dir; returns the
    corpus directory containing transcripts.parquet + gt_triples.parquet."""
    d = corpus_dir(sf_dir)
    tp = os.path.join(d, "transcripts.parquet")
    gp = os.path.join(d, "gt_triples.parquet")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    transcripts, gt = generate_corpus(n_convs_for_sf(sf_from_dir(sf_dir)))
    pq.write_table(transcripts, tp, row_group_size=64 * 1024)
    pq.write_table(gt, gp)
    with open(done, "w") as f:
        f.write("ok")
    return d


def ensure_corpus_parallel(n_convs: int, name: str) -> str:
    """Ray-parallel corpus generation for bench-scale inputs (same pure
    per-conversation generator, so the row SET is identical to the plain
    loop; caller must not assume row order).  Cached under CORPUS_ROOT;
    returns the transcripts parquet directory."""
    import ray
    import ray.data

    d = os.path.join(CORPUS_ROOT, CORPUS_VERSION, name)
    tdir = os.path.join(d, "transcripts")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return tdir
    os.makedirs(tdir, exist_ok=True)

    def gen_batch(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in batch.column("id").to_pylist():
            r, _ = gen_conversation(int(i))
            rows.extend(r)
        return _rows_to_table(rows, S.TRANSCRIPTS)

    # ~25k convs (~400k rows, ~5MB compressed) per output file: enough
    # files for read parallelism, big enough that per-task scheduling
    # overhead (serial on the driver) stays negligible
    blocks = max(32, n_convs // 25000)
    (ray.data.range(n_convs, override_num_blocks=blocks)
     .map_batches(gen_batch, batch_format="pyarrow")
     .write_parquet(tdir))
    with open(done, "w") as f:
        f.write("ok")
    return tdir


def transcripts_path(sf_dir: str) -> str:
    return os.path.join(ensure_corpus(sf_dir), "transcripts.parquet")


PARTITION_BUCKETS = 8


def ensure_corpus_partitioned(sf_dir: str,
                              n_buckets: int = PARTITION_BUCKETS) -> str:
    """Hash-partitioned multi-file transcript layout (r5): one directory
    per conv-hash bucket (``bucket=<i>/part.parquet``, Hive layout), the
    100-TB resumable-output shape — a reader that knows its bucket (or a
    conv-prefix predicate mapped to buckets) SKIPS whole files instead
    of scanning one monolith.  Reference analog: the filtered source
    discovery of ``SourceFiles.determine``
    (``x2cpg/.../SourceFiles.scala:67-96``) — prune at enumeration, not
    after the read.  Same rows as the flat corpus (pytest-asserted)."""
    import pandas as pd

    d = corpus_dir(sf_dir)
    pdir = os.path.join(d, f"transcripts_part{n_buckets}")
    done = os.path.join(pdir, "_SUCCESS")
    if os.path.exists(done):
        return pdir
    t = pq.read_table(transcripts_path(sf_dir))
    h = pd.util.hash_array(
        t.column("conv_id").to_numpy(zero_copy_only=False)) % n_buckets
    for b in range(n_buckets):
        sub = t.filter(pa.array(h == b))
        bdir = os.path.join(pdir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(sub, os.path.join(bdir, "part-0.parquet"),
                       row_group_size=64 * 1024)
    with open(done, "w") as f:
        f.write("ok")
    return pdir


def conv_bucket(conv_id: str, n_buckets: int = PARTITION_BUCKETS) -> int:
    """The bucket a conversation's rows live in (pure function of the
    key — the reader-side half of the partitioning contract).  NB: the
    modulo runs on a Python int — a numpy uint64 SCALAR % python-int
    silently converts to float64 and mangles large hashes (array %
    python-int stays uint64; the writer path is unaffected)."""
    import numpy as np
    import pandas as pd
    return int(int(pd.util.hash_array(
        np.asarray([conv_id], dtype=object))[0]) % n_buckets)


def gt_path(sf_dir: str) -> str:
    return os.path.join(ensure_corpus(sf_dir), "gt_triples.parquet")
