"""Extraction rule pack: vocabulary, sentence templates, regexes, normalizers.

This is the single source of truth for the transcript "grammar" — the analog
of the reference's per-language AST grammar (c2cpg AstCreator + the fork's
DependencyJsonGenerator relation patterns,
``semanticcpg/.../dependencyJsonGenerator/DependencyJsonGenerator.scala:21-501``).
Both the distributed pipeline (joern_ray.stages) and the naive oracle
extractor (joern_ray.extract.oracle) consume these patterns; their
*implementations* are independent so the P/R test is meaningful.

All regexes are RE2-compatible (pyarrow.compute.extract_regex and DuckDB both
use RE2) and also valid Python ``re`` patterns.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Vocabulary (deterministic; used by the synthetic corpus generator and by
# tests — the extractor itself is vocabulary-agnostic and purely pattern-based)
# ---------------------------------------------------------------------------

PERSONS = [
    "Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Karl", "Laura", "Mallory", "Nina", "Oscar", "Peggy",
    "Quinn", "Rachel", "Steve", "Trent", "Ursula", "Victor", "Wendy",
    "Xavier", "Yolanda", "Zach", "Aaron", "Bella", "Colin", "Daisy",
    "Edgar", "Fiona", "George", "Hannah", "Ian", "Julia", "Kevin", "Lily",
    "Marcus", "Nora",
]

ORG_BASES = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Wonka",
    "Tyrell", "Cyberdyne", "Aperture", "Hooli", "Vandelay", "Soylent",
    "Oscorp", "Virtucon", "Zorin",
]
ORG_SUFFIXES = ["Corp", "Corporation", "Inc", "Labs"]
# legal-suffix tokens stripped by the org normalizer (lowercase)
ORG_STOP_TOKENS = {"corp", "corporation", "inc", "labs", "llc", "ltd", "the", "group"}

TOOLS = [
    "search", "browser", "calculator", "compiler", "profiler", "debugger",
    "editor", "terminal",
]

MODULES = [
    "auth.core", "auth.session", "net.http", "net.dns", "db.index",
    "db.query", "ui.render", "ui.layout", "fs.cache", "fs.io",
]

FILLERS = [
    "Thanks, that makes sense.",
    "Let me think about this for a moment.",
    "Could you clarify the last point?",
    "Here is a summary of the discussion so far.",
    "That approach sounds reasonable to me.",
    "I will follow up with more details tomorrow.",
    "Understood, proceeding with the plan.",
    "The results look consistent with expectations.",
]

PRONOUNS = ("She", "He")
# possessive pronouns open the managed_by pronoun template; kept separate
# because synth uses PRONOUNS for subject-pronoun turns
POSS_PRONOUNS = ("Her", "His")
# the PLURAL subject pronoun (v32): "They" opens the plural-pronoun
# template family below, whose resolution expands to the full committed
# person SET of the anchor turn (see the plural resolution contract).
# It also joins SUBJ_PRONOUNS so that a "They" captured by any OTHER
# template's person-subject slot is treated as a pronoun surface —
# dropped from explicit emission and from referent state — keeping the
# contract total on dirty input (a plural pronoun in a coordination
# slot falls back to SINGULAR resolution, the max-person rule, a
# documented simplification; synth never generates that shape).
PLURAL_PRONOUN = "They"
# the ORG pronoun (v38): "It" opens the org-pronoun template family
# (see ORG_PRONOUN_TEMPLATES below) and joins SUBJ_PRONOUNS so that an
# 'It' captured by any other template's subject slot is a pronoun
# surface, never a name (the dirty-input fallback is documented at the
# template family)
ORG_PRONOUN = "It"
# the shared subject-surface pronoun test (one source of truth for all
# FOUR implementations — engine kernel, Python oracle, subprocess
# worker, SQL mirror): a captured person-slot surface equal to any of
# these is a pronoun, never a name
SUBJ_PRONOUNS = PRONOUNS + POSS_PRONOUNS + (PLURAL_PRONOUN, ORG_PRONOUN)
# OBJECT-slot pronoun surface test (v25): object slots can additionally
# capture the LOWERCASE mid-sentence forms ("Bob, her manager, ..."), which
# subject slots never can (every subject group requires a leading capital).
# Extending the object test is a no-op for pre-v25 templates — their person
# object groups are all [A-Z][a-z]+, which cannot capture a lowercase form.
OBJ_PRONOUNS = SUBJ_PRONOUNS + ("her", "him", "his")

# ---------------------------------------------------------------------------
# Sentence templates.  Exactly one template sentence per templated turn.
# kinds: person | org | tool | module | conv
# ---------------------------------------------------------------------------

# Sentence segmentation contract (shared by the Arrow pipeline, the Python
# oracle and the DuckDB oracle — all RE2): a sentence boundary is
# punctuation [.?!] followed by one space, OUTSIDE quotation marks (v23:
# quote-aware — a multi-sentence quotation 'X said "A uses t daily. She
# maintains m."' is ONE sentence).  RE2 has neither lookbehind nor
# lookaround, so every implementation uses the same two-pass recipe:
#   1. mark EVERY '[.?!] ' boundary with \x1e (keeping the punctuation,
#      consuming exactly the one space) and split on the mark;
#   2. PARITY REPAIR: a part whose preceding in-turn double-quote count is
#      ODD started inside an open quotation — merge it into its
#      predecessor with one space (the exact inverse of step 1, since the
#      mark consumed exactly one space).
# A turn may carry several sentences; each is matched independently (the
# multi-match analog of the reference's per-statement AST visit).
SENT_MARK_RE = r"([.?!]) "
SENT_MARK_SUB = "\\1\x1e"
SENT_SPLIT = "\x1e"


def split_sentences(text: str) -> list[str]:
    """Reference implementation of the segmentation contract above (plain
    Python; the Arrow kernel in ``stages.extract._explode_sentences`` and
    the SQL mirror in ``extract.sqlgen._sents_cte`` implement the same
    mark/split/parity-repair recipe independently)."""
    parts = re.sub(SENT_MARK_RE, SENT_MARK_SUB, text).split(SENT_SPLIT)
    out: list[str] = []
    quotes = 0   # double quotes seen in all preceding parts
    for p in parts:
        if out and quotes % 2 == 1:
            out[-1] = out[-1] + " " + p
        else:
            out.append(p)
        quotes += p.count('"')
    return out

# (pred, regex, subj_kind, obj_kind).  Group names subj/obj are mandatory.
# Modifier support (the relation-attribute analog): an optional 'no longer '
# before the verb (negated=true), and '?' terminators (in_question=true).
#
# Tense attribute (v24) — the third relation attribute (after negated /
# in_question; the fork's per-relation structural attributes,
# ``DependencyJsonGenerator.scala:278-292``).  Shared LEXICAL contract
# (sentence-level, like negated — every emission of one sentence carries
# the same value; all four implementations run the identical RE2 pair):
#
#   is_past(sent) = matches(PAST_RE) AND NOT matches(PRES_PASSIVE_RE)
#
# PAST_RE is the word-bounded alternation of every past-form verb token
# the grammar can produce: the intrinsically-past verbs (reported,
# acquired, met, joined, left, partnered, introduced, mentioned) plus the
# past alternants of the present-tense families (worked / used /
# maintained / managed / was).  PRES_PASSIVE_RE carves out the one
# construct where a participle is NOT past tense: a participle directly
# after 'is' is a present passive ('auth.core is maintained by Alice');
# the past passive ('was maintained by') stays past via 'was'.
# PRES_PERFECT_RE (v27) carves out the second non-past participle
# position: a participle after 'has' is a PRESENT perfect ('Alice has
# worked at Acme'); the past perfect ('had worked') stays past via its
# participle with no carve-out.  Templates whose verb admits both tenses
# alternate the verb form in their regex ((?:works|worked)); templates
# left un-alternated simply never match a past-form sentence, so the
# contract stays total.
#
# v29 extends both alternations for the ditransitive / reciprocal /
# quoted aspect families: 'were' joins PAST_RE (past progressive of a
# PLURAL subject — 'Alice and Bob were meeting'; no other construct can
# produce the token), and PRES_PERFECT_RE gains the 'have' auxiliary
# (plural present perfect — 'have met') plus the one irregular
# participle the grammar produces ('met', which '[a-z]+ed' cannot
# cover).  'has/have introduced' rides the existing '[a-z]+ed' arm.
#
#   is_past(sent) = matches(PAST_RE)
#                   AND NOT matches(PRES_PASSIVE_RE)
#                   AND NOT matches(PRES_PERFECT_RE)
#
# v31 composes ASPECT with the PASSIVE: 'is/was being maintained by'
# (progressive passive) and 'has/had been maintained by' (perfect
# passive).  Two carve-out extensions keep the tense contract total:
# PRES_PASSIVE_RE admits the optional 'being ' ('is being maintained'
# is PRESENT progressive passive; 'was being' stays past via 'was'),
# and PRES_PERFECT_RE gains the 'been' participle ('has been
# maintained' is a PRESENT perfect passive, exactly like 'has worked';
# 'had been' stays past via its 'maintained' participle with no
# carve-out).  'being'/'been' are tokens no other construct can
# produce, so the kernels stay collision-free.
#
# v35 extends the aspect alternations over the five remaining
# intrinsically-past SINGULAR families (met-with / joined / left /
# acquired / partnered): 'is/was meeting with', 'has/had joined',
# 'is leaving', 'has partnered with', ... — the v29 recipe applied to
# the singular is/was/has/had auxiliaries.  Tense carve-outs: the new
# -ed participles (joined / acquired / partnered) already ride the
# PRES_PERFECT '[a-z]+ed' arm ('has joined' is non-past); the one new
# IRREGULAR participle 'left' joins it explicitly ('has left'
# non-past; 'had left' stays past via 'left').  No passive collision:
# none of the new progressive participles ends in -ed, so
# PRES_PASSIVE_RE is untouched.
PAST_RE = (r"\b(?:worked|used|maintained|managed|was|were|reported|"
           r"acquired|met|joined|left|partnered|introduced|mentioned)\b")
PRES_PASSIVE_RE = r"\bis (?:being )?[a-z]+ed\b"
PRES_PERFECT_RE = r"\b(?:has|have) (?:[a-z]+ed|met|left|been)\b"

# Aspect attribute (v27) — the fourth relation attribute, completing the
# fork's 3+-attribute structural family
# (``DependencyJsonGenerator.scala:278-292``).  Shared LEXICAL contract
# (sentence-level, like negated / is_past — every emission of one
# sentence carries the same value; all four implementations run the
# identical RE2 pair):
#
#   aspect(sent) = 'progressive'  if matches(PROG_RE)
#                  'perfect'      if matches(PERF_RE)
#                  'simple'       otherwise
#
# PROG_RE is the word-bounded alternation of copula + present participle
# for every verb family the grammar alternates ('is working' / 'was
# using' ...); PERF_RE is have-auxiliary + past participle ('has worked'
# / 'had maintained' ...).  The two are disjoint by construction (a
# sentence carries one verb group per relation family), and neither can
# match the present passive ('is maintained BY' — 'maintained' is not a
# PROG participle).  Tense composes independently: 'was working' is past
# progressive (PAST_RE via 'was'), 'is working' present progressive,
# 'had worked' past perfect, 'has worked' present perfect (the
# PRES_PERFECT_RE carve-out above keeps it non-past).
#
# v29 extends BOTH alternations to the three non-simple multi-template
# families the v27 pass left at simple aspect: the ditransitive
# ('is/was introducing' / 'has/had introduced' — plain and
# quoted-nested), the reciprocal ('are/were meeting' / 'have/had met' —
# plural subject, hence the are/were/have auxiliaries), and quoted
# speech ('X said "Alice is using vim daily."' — the inner verb group
# is the uses family, already covered lexically; only the TEMPLATE
# regex needed extending).  Disjointness arguments are unchanged: one
# verb group per relation family per sentence, and no participle here
# can follow a bare copula in a passive ('introducing'/'meeting' are
# not '-ed' forms).
# v31 extends both alternations to the PASSIVE family: the passive
# progressive auxiliary chain is copula + 'being' ('is being
# maintained'), so 'being' joins the PROG_RE participle set; the
# passive perfect is have-auxiliary + 'been' ('has been maintained'),
# so 'been' joins PERF_RE.  Disjointness holds as before: a sentence
# carries one verb group per relation family, and neither kernel can
# match the other's chain ('being' never follows has/had/have,
# 'been' never follows a bare copula in this grammar).
# v35: the five singular intrinsically-past families contribute their
# participles — joining/leaving/acquiring/partnering to PROG_RE
# ('meeting' arrived with v29) and joined/left/acquired/partnered to
# PERF_RE ('met' arrived with v29).  One-verb-group-per-sentence keeps
# the kernels disjoint, and none of the new progressive participles is
# an -ed form, so the passive carve-out is unaffected.
PROG_RE = (r"\b(?:is|was|are|were) "
           r"(?:working|using|maintaining|managing|introducing|meeting|"
           r"joining|leaving|acquiring|partnering|being)\b")
PERF_RE = (r"\b(?:has|had|have) "
           r"(?:worked|used|maintained|managed|introduced|met|joined|"
           r"left|acquired|partnered|been)\b")
ASPECT_SIMPLE = "simple"
ASPECT_PROG = "progressive"
ASPECT_PERF = "perfect"

# Temporal-adjunct attribute (v33) — the FIFTH relation attribute
# (after negated / in_question / is_past / aspect; the fork's structural
# attribute family keeps growing per
# ``DependencyJsonGenerator.scala:278-292``).  A sentence-final
# ``since <year>`` adjunct ("Alice has worked at Acme since 2019.")
# yields an int32 ``since_year``; sentences without the adjunct carry
# NULL.  Shared LEXICAL contract (sentence-level, like every attribute
# kernel — all four implementations run the identical RE2 extract):
#
#   since_year(sent) = int(group 'year') if matches(SINCE_RE) else NULL
#
# The adjunct is anchored to the sentence END ("... since 2019." /
# "...?"), so a quoted sentence ('X said "... since 2019."' ends '."')
# never carries it — by design: the templates that ACCEPT the adjunct
# are exactly the non-quoted alternating families below (works_at /
# uses / maintains / manages and the singular+plural pronoun variants);
# their regexes gain an optional non-capturing ``(?: since [12][0-9]{3})?``
# before the terminator.  Generation pairs the adjunct with the PERFECT
# verb groups only ('has/had worked ... since 2019' — natural English);
# the kernel is lexical, so a since-suffixed simple form would still
# classify, keeping the contract total on dirty input.
SINCE_RE = r" since (?P<year>[12][0-9]{3})[.?]$"
# the optional template suffix (kept as ONE shared fragment so every
# since-accepting template regex is extended identically)
SINCE_OPT = r"(?: since [12][0-9]{3})?"

# the optional hedge-adverb prefix (v36 — see HEDGE_MARK below): sits
# between the subject and the (optional) negation in every accepting
# template ('Alice reportedly no longer works at X.')
HEDGE_OPT = r"(?:reportedly )?"

TEMPLATES = [
    # v27: the four alternating families admit progressive (is/was V-ing)
    # and perfect (has/had V-ed) verb groups alongside the v24 simple
    # present/past pair; the aspect attribute kernel (PROG_RE/PERF_RE
    # above) classifies the matched sentence
    # v33: the four alternating families additionally accept the optional
    # sentence-final temporal adjunct (SINCE_OPT) — the obj groups stay
    # non-greedy and cannot swallow ' since <year>' because their
    # character classes admit no digits
    # v36: the four alternating families accept the optional hedge
    # adverb (HEDGE_OPT) before the negation/verb group
    ("works_at",
     r"^(?P<subj>[A-Z][a-z]+) " + HEDGE_OPT
     + r"(?:no longer )?(?:work(?:s|ed)|is working|"
     r"was working|has worked|had worked) at (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "person", "org"),
    ("reported_bug",
     r"^(?P<subj>[A-Z][a-z]+) reported a bug in (?P<obj>[a-z_]+(?:\.[a-z_]+)*)[.?]$",
     "person", "module"),
    ("uses",
     r"^(?P<subj>[A-Z][a-z]+) " + HEDGE_OPT
     + r"(?:no longer )?(?:use(?:s|d)|is using|"
     r"was using|has used|had used) (?P<obj>[a-z0-9_]+) daily"
     + SINCE_OPT + r"[.?]$",
     "person", "tool"),
    # v35: the five intrinsically-past singular families gain the full
    # aspect alternation (simple = the bare past) plus the v33 temporal
    # adjunct (generation pairs it with the perfect groups, as always);
    # obj groups admit no digits, so SINCE_OPT can never be swallowed
    ("acquired",
     r"^(?P<subj>[A-Z][A-Za-z ]+?) (?:acquired|is acquiring|"
     r"was acquiring|has acquired|had acquired) (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org", "org"),
    ("met",
     r"^(?P<subj>[A-Z][a-z]+) (?:met|is meeting|was meeting|has met|"
     r"had met) with (?P<obj>[A-Z][a-z]+)"
     + SINCE_OPT + r"[.?]$",
     "person", "person"),
    ("joined",
     r"^(?P<subj>[A-Z][a-z]+) (?:joined|is joining|was joining|"
     r"has joined|had joined) (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "person", "org"),
    ("left_org",
     r"^(?P<subj>[A-Z][a-z]+) (?:left|is leaving|was leaving|has left|"
     r"had left) (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "person", "org"),
    ("manages",
     r"^(?P<subj>[A-Z][a-z]+) " + HEDGE_OPT
     + r"(?:manage(?:s|d)|is managing|was managing|"
     r"has managed|had managed) (?P<obj>[A-Z][a-z]+)"
     + SINCE_OPT + r"[.?]$",
     "person", "person"),
    ("maintains",
     r"^(?P<subj>[A-Z][a-z]+) " + HEDGE_OPT
     + r"(?:maintain(?:s|ed)|is maintaining|"
     r"was maintaining|has maintained|had maintained) "
     r"(?P<obj>[a-z_]+(?:\.[a-z_]+)*)"
     + SINCE_OPT + r"[.?]$",
     "person", "module"),
    ("partnered",
     r"^(?P<subj>[A-Z][A-Za-z ]+?) (?:partnered|is partnering|"
     r"was partnering|has partnered|had partnered) with "
     r"(?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org", "org"),
]

# Multi-relation sentence templates (the nested-AST analog: coordination,
# appositive, relative clause, quoted speech — one sentence, several
# relations).  Each entry: (name, regex, emissions) where every emission is
# (pred, subj_group, subj_kind, obj_group, obj_kind, slot_idx, clause):
#   slot_idx — position of the subject in a coordinated list (0 default);
#   clause   — containing-clause kind: main | appositive | relative | quoted.
# These two are the slot-position / containing-clause relation attributes
# (the fork's used_in_index / offset_in_base structural-attribute analog,
# ``DependencyJsonGenerator.scala:278-292``).
# Shared contract notes:
#   * attribute kernels (negated / in_question) stay SENTENCE-level — every
#     emission of a sentence carries the same attrs;
#   * every EMITTED event row feeds pronoun-referent state by the usual
#     per-row rule (obj person shadows subj person; turn max wins) — the
#     speaker of a quoted sentence is NOT an emitted slot and contributes
#     no state;
#   * a person subject slot whose captured surface is a pronoun
#     (SUBJ_PRONOUNS — "She and Bob work at X") emits a PRONOUN event
#     carrying the emission's slot_idx/clause, resolved by the standard
#     Stage-B rule (referent = committed max person of the latest
#     strictly-earlier turn); the resolved row does NOT feed referent
#     state, while its non-pronoun partner slots do;
#   * all capture groups in these regexes must be NAMED (group numbers in
#     the SQL mirror are derived from the order of appearance).
MULTI_TEMPLATES = [
    # v30: coordinated subjects are PLURAL, so their aspect alternation
    # uses the are/were/have auxiliaries the v29 reciprocal already put
    # into PROG_RE / PAST_RE / PRES_PERFECT_RE — extending coordination
    # is a pure template change, no kernel edits
    # v37: the multi-slot families accept the optional hedge adverb
    # (HEDGE_OPT, the v36 position — between subject(s) and verb group);
    # the kernel is unchanged, so every emission of a hedged sentence
    # carries hedged=true (sentence-level, like negated)
    ("coord_works_at",
     r'^(?P<subj>[A-Z][a-z]+) and (?P<subj2>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:work(?:ed)?|are working|were working|have worked|had worked)'
     r' at (?P<obj>[A-Z][A-Za-z ]+?)[.?]$',
     [("works_at", "subj", "person", "obj", "org", 0, "main"),
      ("works_at", "subj2", "person", "obj", "org", 1, "main")]),
    ("coord_uses",
     r'^(?P<subj>[A-Z][a-z]+) and (?P<subj2>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:use(?:d)?|are using|were using|have used|had used) '
     r'(?P<obj>[a-z0-9_]+) daily[.?]$',
     [("uses", "subj", "person", "obj", "tool", 0, "main"),
      ("uses", "subj2", "person", "obj", "tool", 1, "main")]),
    ("appos_maintainer",
     r'^(?P<subj>[A-Z][a-z]+), the maintainer of '
     r'(?P<app>[a-z_]+(?:\.[a-z_]+)*), (?:no longer )?works at '
     r'(?P<obj>[A-Z][A-Za-z ]+?)[.?]$',
     [("maintains", "subj", "person", "app", "module", 0, "appositive"),
      ("works_at", "subj", "person", "obj", "org", 0, "main")]),
    ("relative_manages",
     r'^(?P<subj>[A-Z][a-z]+), who manages (?P<rel>[A-Z][a-z]+), joined '
     r'(?P<obj>[A-Z][A-Za-z ]+?)[.?]$',
     [("manages", "subj", "person", "rel", "person", 0, "relative"),
      ("joined", "subj", "person", "obj", "org", 0, "main")]),
    # v29: the quoted inner verb group gains the uses family's full
    # aspect alternation ('X said "Alice is using vim daily."') — the
    # sentence-level aspect kernel sees the inner group lexically, so no
    # kernel change was needed, only this regex.
    # v37: a hedge INSIDE the quote ('X said "Alice reportedly uses vim
    # daily."') marks the quoted claim; clause stays 'quoted'
    ("quoted_uses",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:use(?:s|d)|is using|was using|has used|had used) '
     r'(?P<obj>[a-z0-9_]+) daily\."$',
     [("uses", "subj", "person", "obj", "tool", 0, "quoted")]),
    # passive voice: the agent (grammatical subject of the relation) appears
    # AFTER the patient in the surface text — exercises the name-based (not
    # position-based) capture-group contract end-to-end.  'is maintained'
    # is PRESENT (the PRES_PASSIVE_RE carve-out of the v24 tense
    # contract); 'was maintained' is the past alternant.
    # v31: the passive composes with ASPECT — the auxiliary chain
    # alternates simple (is/was), progressive (is/was being) and
    # perfect (has/had been); tense composes independently ('is being'
    # present, 'was being' past, 'has been' present via the v31
    # PRES_PERFECT carve-out, 'had been' past).  Longer alternants come
    # first so the leftmost-alternative submatch stays unambiguous.
    # v37: the hedge precedes the PASSIVE auxiliary chain ('auth.core
    # reportedly is maintained by Alice.') — the zero-kernel-edit
    # position: the v24/v31 tense carve-outs still see their unbroken
    # 'is ... maintained' / 'has been' token sequences
    ("passive_maintains",
     r'^(?P<obj>[a-z_]+(?:\.[a-z_]+)*) ' + HEDGE_OPT
     + r'(?:is being|was being|has been|had been|is|was) maintained by '
     r'(?P<subj>[A-Z][a-z]+)[.?]$',
     [("maintains", "subj", "person", "obj", "module", 0, "passive")]),
    # possessive construct: "<B>'s manager is <A>" ⇒ manages(A, B); the
    # relation's subject is the LAST surface mention
    ("possessive_manager",
     r"^(?P<obj>[A-Z][a-z]+)'s manager (?:is|was) (?P<subj>[A-Z][a-z]+)[.?]$",
     [("manages", "subj", "person", "obj", "person", 0, "possessive")]),
    # OBJECT-side coordination ("works at both Y and Z"): slot_idx is the
    # position in whichever list is coordinated (objects here).  The
    # lowercase "both" keeps the single works_at template from partially
    # matching (the plural-verb trick of coord_works_at).
    ("coord_orgs",
     r'^(?P<subj>[A-Z][a-z]+) works at both (?P<obj>[A-Z][A-Za-z ]+?) and '
     r'(?P<obj2>[A-Z][A-Za-z ]+?)[.?]$',
     [("works_at", "subj", "person", "obj", "org", 0, "main"),
      ("works_at", "subj", "person", "obj2", "org", 1, "main")]),
    # 3-way subject coordination ("A, B and C work at X"): the leading
    # "<Name>," keeps the 2-way coord template from matching (its subj
    # group admits no comma), and vice versa the 2-way sentence carries no
    # comma — the lists are disjoint by anchor, not by precedence.
    ("coord3_works_at",
     r'^(?P<subj>[A-Z][a-z]+), (?P<subj2>[A-Z][a-z]+) and '
     r'(?P<subj3>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:work(?:ed)?|are working|were working|have worked|had worked)'
     r' at (?P<obj>[A-Z][A-Za-z ]+?)[.?]$',
     [("works_at", "subj", "person", "obj", "org", 0, "main"),
      ("works_at", "subj2", "person", "obj", "org", 1, "main"),
      ("works_at", "subj3", "person", "obj", "org", 2, "main")]),
    # NESTED construct: coordination inside quoted speech — two relations,
    # both in a quoted clause; the speaker is still not an emitted slot.
    # The inner " and ... use " keeps plain quoted_uses from matching.
    ("quoted_coord_uses",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) and '
     r'(?P<subj2>[A-Z][a-z]+) '
     r'(?:use(?:d)?|are using|were using|have used|had used) '
     r'(?P<obj>[a-z0-9_]+) daily\."$',
     [("uses", "subj", "person", "obj", "tool", 0, "quoted"),
      ("uses", "subj2", "person", "obj", "tool", 1, "quoted")]),
    # v19: VERB-PHRASE coordination — ONE subject, TWO different
    # relations ("Alice maintains auth.core and uses vim daily.").  All
    # earlier coordination is NP-level (coordinated subjects or objects
    # of one relation); here the conjuncts are whole predicates.  The
    # plain maintains/uses templates cannot match (each anchors [.?]$
    # immediately after its object).  A pronoun subject rides the
    # generic pronoun arm and resolves ONCE for both emissions.  The
    # explicit-subject maintains emission feeds the module-keyed
    # descriptor state exactly like every other maintains row (state
    # selection is by predicate, not by template).
    ("vp_coord_maintains_uses",
     r'^(?P<subj>[A-Z][a-z]+) maintains (?P<obj>[a-z_]+(?:\.[a-z_]+)*) '
     r'and uses (?P<obj2>[a-z0-9_]+) daily[.?]$',
     [("maintains", "subj", "person", "obj", "module", 0, "vp_coord"),
      ("uses", "subj", "person", "obj2", "tool", 0, "vp_coord")]),
    # v19: POSTPOSED speech attribution ('"Bob uses vim daily," said
    # Alice.') — the quote PRECEDES the attribution.  Same contract as
    # quoted_uses: clause='quoted', the speaker is not an emitted slot
    # and contributes no referent state; a pronoun subject inside the
    # quote resolves in the quoting turn's scope (the v11 contract).
    # The comma before the closing quote is not a sentence boundary
    # (the splitter only breaks on '[.?!] '), and the terminator is a
    # plain '.', so — unlike quoted_uses — the sentence may be followed
    # by further sentences in the same turn.
    ("postposed_quoted_uses",
     r'^"(?P<subj>[A-Z][a-z]+) uses (?P<obj>[a-z0-9_]+) daily," said '
     r'(?P<speaker>[A-Z][a-z]+)\.$',
     [("uses", "subj", "person", "obj", "tool", 0, "quoted")]),
    # v20: DITRANSITIVE ("Alice introduced Bob to Carol.") — ONE verb,
    # THREE NP slots: the recipient is a SECOND object of the same
    # relation, discriminated by slot_idx (0 = direct object, 1 =
    # recipient).  Both objects are person slots and feed referent state
    # per-row by the usual rule (obj person shadows subj; turn max wins —
    # so the committed referent of a ditransitive turn is
    # max(direct object, recipient)).  A pronoun SUBJECT rides the
    # generic multi-template pronoun arm and resolves ONCE for both
    # emissions (both rows share the subj group).  Disjointness is by
    # literal: no other template anchors ' introduced '.
    # v29: the ditransitive admits progressive ('is/was introducing')
    # and perfect ('has/had introduced') verb groups — the aspect kernel
    # (PROG_RE/PERF_RE) classifies the sentence; simple stays the bare
    # past ('introduced', an intrinsically-past verb in this grammar).
    ("ditrans_introduced",
     r'^(?P<subj>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:introduced|is introducing|'
     r'was introducing|has introduced|had introduced) '
     r'(?P<obj>[A-Z][a-z]+) to (?P<obj2>[A-Z][a-z]+)[.?]$',
     [("introduced", "subj", "person", "obj", "person", 0, "ditransitive"),
      ("introduced", "subj", "person", "obj2", "person", 1,
       "ditransitive")]),
    # v21: RECIPROCAL coordination ("Alice and Bob met.") — the verb is
    # symmetric, so the construct emits the relation in BOTH directions
    # (slot_idx = position of the row's SUBJECT in the coordination).
    # This is the first template whose emissions put a coordination slot
    # in the OBJECT position, which activates the v21 object-pronoun
    # rule for multi templates (below): "She and Bob met." yields a
    # pronoun-SUBJECT event for met(?, Bob) and an object-pronoun event
    # for met(Bob, ?) — both resolve to the same committed referent;
    # only Bob (the object-pronoun row's explicit subject) feeds state.
    # Disjointness: no other template anchors ' met[.?]$' (the single
    # 'met' template requires ' with ' after its verb group).
    # v29: the reciprocal admits progressive ('are/were meeting') and
    # perfect ('have/had met') — the PLURAL coordinated subject selects
    # the are/were/have auxiliaries, which is why PROG_RE/PAST_RE/
    # PRES_PERFECT_RE carry them (no singular construct can produce
    # those tokens, so the kernels stay collision-free).
    ("recip_met",
     r'^(?P<subj>[A-Z][a-z]+) and (?P<subj2>[A-Z][a-z]+) ' + HEDGE_OPT
     + r'(?:met|are meeting|were meeting|have met|had met)[.?]$',
     [("met", "subj", "person", "subj2", "person", 0, "reciprocal"),
      ("met", "subj2", "person", "subj", "person", 1, "reciprocal")]),
    # v22: DITRANSITIVE nested in QUOTED speech ('X said "Alice
    # introduced Bob to Carol."') — the v20 double emission under the
    # quoting contract: clause 'quoted', the speaker is not an emitted
    # slot and feeds no state, a pronoun subject resolves in the QUOTING
    # turn's scope (v11), and both person objects feed referent state
    # per-row.  Turn-final only (the '."' terminator carries no sentence
    # boundary, like quoted_uses).
    ("quoted_ditrans_introduced",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) '
     r'(?:introduced|is introducing|was introducing|has introduced|'
     r'had introduced) '
     r'(?P<obj>[A-Z][a-z]+) to (?P<obj2>[A-Z][a-z]+)\."$',
     [("introduced", "subj", "person", "obj", "person", 0, "quoted"),
      ("introduced", "subj", "person", "obj2", "person", 1, "quoted")]),
    # v23: MULTI-SENTENCE quoted speech ('X said "Alice uses vim daily.
    # She maintains auth.core."') — enabled by the quote-aware splitter
    # (the parity-repair contract above): the whole quotation is ONE
    # sentence, so one RE2 match emits both inner relations.  Contract:
    #   * clause 'quoted' for every emission; the SPEAKER is not an
    #     emitted slot (no state commit, no shadowing) — the v11 rule;
    #   * sent_idx is the OUTER sentence's ordinal (the inner boundary is
    #     not a sentence boundary), shared by both emissions;
    #   * INTRA-QUOTE anaphora resolves in the QUOTING turn's scope — a
    #     pronoun subject of the second inner sentence resolves to the
    #     committed referent of the latest strictly-earlier turn, NOT to
    #     the first inner sentence's subject (same-turn state is never
    #     visible: resolution stays a pure function of the committed
    #     turn-state stream, exactly the v11 rationale);
    #   * pronoun CHAINS (v26): EITHER inner subject slot — or BOTH — may
    #     be a pronoun; each resolves INDEPENDENTLY under the rule above,
    #     so a chain of intra-quote pronouns co-refers to the same
    #     committed referent (there is no intra-quote binding, even to an
    #     explicit first inner subject).  Resolved rows commit nothing;
    #     an explicit inner subject commits referent (and, for maintains,
    #     descriptor) state exactly as in the single-pronoun cases;
    #   * an EXPLICIT maintains subject inside the quote feeds the
    #     module-keyed descriptor state as usual (state selection is by
    #     predicate, not by construct).
    # Disjointness: quoted_uses anchors 'daily\\."$' (no inner boundary);
    # the plain maintains template anchors '^<Name> maintains'.
    ("quoted_multi_uses_maintains",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) uses '
     r'(?P<obj>[a-z0-9_]+) daily\. (?P<subj2>[A-Z][a-z]+) maintains '
     r'(?P<obj2>[a-z_]+(?:\.[a-z_]+)*)\."$',
     [("uses", "subj", "person", "obj", "tool", 0, "quoted"),
      ("maintains", "subj2", "person", "obj2", "module", 0, "quoted")]),
    # v25: PRONOUN-IN-APPOSITIVE ("Bob, her manager, joined Initech.") —
    # the appositive asserts manages(Bob, referent) where the referent is
    # the committed pronoun referent of the latest strictly-earlier turn;
    # the main clause carries joined(Bob, org).  This is the v21
    # object-pronoun rule applied INSIDE an appositive clause, and the
    # grammar's first LOWERCASE mid-sentence pronoun: the obj group
    # captures 'her'/'his', which is a pronoun surface under the v25
    # OBJ_PRONOUNS extension (subject slots are unaffected — they never
    # admit lowercase).  Emission 1 therefore becomes an OBJECT-PRONOUN
    # event (explicit subj, NULL obj, clause 'appositive'): Stage B fills
    # the object and the explicit subject feeds referent state.  The
    # resolved manages row never feeds the manager-descriptor state
    # (pronoun-RESOLVED rows never commit, the v12 discipline).
    # Disjointness: no other template admits ', her manager,' (the plain
    # 'joined' template anchors '^<Name> joined'; possessive_manager
    # anchors "'s manager "; descriptor templates anchor 'The manager
    # of ').  A subject-pronoun variant ("She, his manager, ...") drops
    # emission 1 (both-pronoun, v21 rule) and emission 2 rides the
    # standard pronoun-subject arm.
    ("appos_manager_pronoun",
     r"^(?P<subj>[A-Z][a-z]+), (?P<obj>her|his) manager, joined "
     r"(?P<obj2>[A-Z][A-Za-z ]+?)[.?]$",
     [("manages", "subj", "person", "obj", "person", 0, "appositive"),
      ("joined", "subj", "person", "obj2", "org", 0, "main")]),
]

# v21 OBJECT-PRONOUN rule for multi-relation templates: an emission whose
# person OBJECT slot captured a pronoun surface (OBJ_PRONOUNS — the
# subject forms plus, since v25, the lowercase mid-sentence forms)
# becomes an OBJECT-PRONOUN event — explicit subject, NULL object, the
# emission's slot/clause — resolved by the standard Stage-B object-pronoun
# rule (referent of the latest strictly-earlier turn fills the OBJECT; the
# explicit subject feeds referent state).  An emission with pronouns in
# BOTH slots is dropped.  Before v21 no multi template could put a pronoun
# in a person object slot grammatically, so this rule changes nothing for
# well-formed v20-and-earlier corpora.

# ---------------------------------------------------------------------------
# LIST templates (v12): open-ended coordination — "A, B, C and D work at X."
# with FOUR OR MORE coordinated names.  RE2 cannot capture a repeated group's
# every occurrence, so the whole head of the list is ONE capture that every
# implementation splits on the shared separator (LIST_SEP); the trailing
# conjunct is its own group.  Shared semantics contract:
#   members  = split(group 'list', LIST_SEP) ++ [group 'last']
#   emission = (pred, member_i, member_kind, obj, obj_kind,
#               slot_idx=i, clause) for every member i
#   pronoun members (SUBJ_PRONOUNS) emit PRONOUN events carrying their
#   slot_idx (resolved by the standard Stage-B rule, no state commit);
#   non-pronoun members feed referent state per-row as usual.
# Disjointness by anchor: the {2,} repetition requires >=3 comma-separated
# names before ' and ' (>=4 total), so coord_works_at (no comma) and
# coord3_works_at (exactly one name before its comma, none after) can never
# match the same sentence.
# Entry: (name, regex, pred, member_kind, obj_kind, clause).
# ---------------------------------------------------------------------------
LIST_SEP = ", "
LIST_TEMPLATES = [
    ("coordN_works_at",
     r'^(?P<list>[A-Z][a-z]+(?:, [A-Z][a-z]+){2,}) and (?P<last>[A-Z][a-z]+)'
     r' ' + HEDGE_OPT
     + r'(?:work(?:ed)?|are working|were working|have worked|had worked)'
     r' at (?P<obj>[A-Z][A-Za-z ]+?)[.?]$',
     "works_at", "person", "org", "main"),
]
# v30: the aspect-alternated list verb keeps the conjunction of the
# longest form-common literals (the MULTI_TEMPLATE_LITERALS tuple
# discipline — ' work' ⊂ 'work'/'worked'/'working'; requiring ' and '
# too keeps the list regex off the hot single-works_at path)
LIST_TEMPLATE_LITERALS = {
    "coordN_works_at": (" and ", " work"),
}

# ---------------------------------------------------------------------------
# Definite-description templates (v12): CROSS-SENTENCE anaphora — the
# appositive established in an earlier turn ("Alice, the maintainer of
# auth.core, ...") is referenced by a definite description later ("The
# maintainer of auth.core met with Bob.").  The reference resolves such
# cross-AST references structurally during linking; here it is the
# descriptor analog of pronoun resolution, with MODULE-KEYED state:
#
#   * state: every emitted maintains event with an EXPLICIT person subject
#     (the maintains template, the appos_maintainer / passive_maintains
#     emissions) commits (module -> person) state at its turn — turn-level
#     commit, lexicographic-max person tie-break within a turn, exactly the
#     pronoun-state discipline.  Pronoun-RESOLVED maintains rows never feed
#     this state (resolution stays a pure function of the committed stream).
#   * resolution: the descriptor's referent is the committed maintainer of
#     its key from the LATEST strictly-earlier turn of the same
#     conversation; unresolvable descriptors emit no triple.
#   * the resolved row does not feed any state; its EXPLICIT person object
#     feeds pronoun-referent state as usual (the object-pronoun-template
#     discipline: the explicit slot anchors and commits).
#
# Event-store discriminator: subj IS NULL AND desc_key IS NOT NULL — the
# desc_key column exists only for these rows.  Entry: (pred, regex,
# obj_kind, clause); group 'key' is the module key, group 'obj' the
# explicit object.
#
# Quoted-nested referent-scope contract (v14): a definite description
# INSIDE quoted speech ('Alice said "The maintainer of auth.core met with
# Bob."') resolves in the QUOTING turn's scope — the committed maintainer
# of the latest strictly-earlier turn — exactly the v11 quoted-pronoun
# convention, and for the same reason: resolution stays a pure function of
# the committed turn-state stream.  The SPEAKER is not an emitted slot (no
# state commit, no shadowing); the explicit person object inside the quote
# feeds referent state as usual.  Resolved rows carry the distinct clause
# 'quoted_definite' so consumers can tell nesting from the plain construct.
# ---------------------------------------------------------------------------
DESC_CLAUSE = "definite"         # clause attribute of plain resolved rows
DESC_QUOTED_CLAUSE = "quoted_definite"   # nested-in-quotes resolved rows
# Descriptor-state FAMILIES (v16): the state machinery is generic over
# (predicate, key-slot) — 'maintains' commits (module -> maintainer),
# 'manages' commits (person -> manager); descriptors of either family
# resolve from the SAME committed turn-state stream.  The two key spaces
# are disjoint by surface shape (module keys always carry at least the
# [a-z_.] alphabet with dots; person keys are capitalized single tokens),
# so one state map serves every family without tagging.  Explicit events
# of these predicates commit state[obj] = max(subj) per turn; pronoun- or
# descriptor-RESOLVED rows never feed it.
DESC_STATE_PREDS = ("maintains", "manages")
DESC_TEMPLATES = [
    ("met",
     r"^The maintainer of (?P<key>[a-z_]+(?:\.[a-z_]+)*) met with "
     r"(?P<obj>[A-Z][a-z]+)[.?]$",
     "person", DESC_CLAUSE),
    # org-object descriptor: the resolved subject is still the committed
    # maintainer, but the explicit object is an ORG — it must NOT feed
    # pronoun-referent state (the kind-conditional feed rule); disjoint
    # from the plain 'joined' template because its subject group admits
    # no space ("The" alone is never followed by " joined").
    ("joined",
     r"^The maintainer of (?P<key>[a-z_]+(?:\.[a-z_]+)*) joined "
     r"(?P<obj>[A-Z][A-Za-z ]+?)[.?]$",
     "org", DESC_CLAUSE),
    # tool-object descriptor (v14): generalizes the machinery beyond
    # person/org objects — the explicit tool object feeds NO referent
    # state (kind-conditional feed); disjoint from the plain 'uses'
    # template because that subject group admits no space.
    ("uses",
     r"^The maintainer of (?P<key>[a-z_]+(?:\.[a-z_]+)*) uses "
     r"(?P<obj>[a-z0-9_]+) daily[.?]$",
     "tool", DESC_CLAUSE),
    # NESTED construct (v14): definite description inside quoted speech —
    # see the referent-scope contract above.  Disjoint from quoted_uses /
    # quoted_coord_uses by the inner 'The maintainer of' anchor.
    ("met",
     r'^(?P<speaker>[A-Z][a-z]+) said "The maintainer of '
     r'(?P<key>[a-z_]+(?:\.[a-z_]+)*) met with (?P<obj>[A-Z][a-z]+)\."$',
     "person", DESC_QUOTED_CLAUSE),
    # manager-family descriptors (v16): person-keyed state from explicit
    # 'manages' events.  Disjoint from the maintainer family by literal
    # ("The manager of " vs "The maintainer of ") and from the possessive
    # construct ("<B>'s manager is <A>") by anchor.
    ("met",
     r"^The manager of (?P<key>[A-Z][a-z]+) met with "
     r"(?P<obj>[A-Z][a-z]+)[.?]$",
     "person", DESC_CLAUSE),
    ("joined",
     r"^The manager of (?P<key>[A-Z][a-z]+) joined "
     r"(?P<obj>[A-Z][A-Za-z ]+?)[.?]$",
     "org", DESC_CLAUSE),
    # manager-family descriptor NESTED in quoted speech (v17): the same
    # quoting-turn referent-scope contract as the quoted maintainer
    # variant (v14) — the speaker is not an emitted slot
    ("met",
     r'^(?P<speaker>[A-Z][a-z]+) said "The manager of '
     r'(?P<key>[A-Z][a-z]+) met with (?P<obj>[A-Z][a-z]+)\."$',
     "person", DESC_QUOTED_CLAUSE),
]
DESC_LITERAL = "The maintainer of "
DESC_STATE_PRED = "maintains"    # the predicate whose events feed the state
DESC_KEY_KIND = "module"

# ---------------------------------------------------------------------------
# OBJECT-side definite descriptions (v15): the descriptor fills the OBJECT
# slot — "Bob met with the maintainer of auth.core." — combining the v9
# object-pronoun discipline with the v12 module-keyed descriptor state:
#
#   * the explicit person SUBJECT anchors the relation AND feeds
#     pronoun-referent state (regardless of whether the descriptor
#     resolves — exactly the object-pronoun rule);
#   * the OBJECT resolves to the committed maintainer of the key from the
#     latest strictly-earlier turn; unresolvable descriptors emit no
#     triple; the resolved row feeds NO state of either family;
#   * a pronoun subject surface ("She met with the maintainer of x.")
#     emits NOTHING — v15 deliberately has no committed-referent x
#     committed-maintainer double resolution (the plain-template
#     pronoun-subject skip rule); the synth corpus never generates it,
#     and all four implementations enforce the skip.
#
# Event-store discriminator: subj NOT NULL ∧ obj NULL ∧ desc_key NOT NULL
# (object pronouns stay subj NOT NULL ∧ obj NULL ∧ desc_key NULL).
# Entry: (pred, regex, clause); groups 'subj' and 'key' are mandatory;
# subj_kind = obj_kind = person by construction.  Disjointness: the plain
# 'met'/'manages' templates require a CAPITALIZED object surface, so the
# lowercase "the maintainer of ..." object can never match them.
# ---------------------------------------------------------------------------
DESC_OBJ_CLAUSE = "definite_obj"
DESC_OBJ_TEMPLATES = [
    ("met",
     r"^(?P<subj>[A-Z][a-z]+) met with the maintainer of "
     r"(?P<key>[a-z_]+(?:\.[a-z_]+)*)[.?]$",
     DESC_OBJ_CLAUSE),
    ("manages",
     r"^(?P<subj>[A-Z][a-z]+) manages the maintainer of "
     r"(?P<key>[a-z_]+(?:\.[a-z_]+)*)[.?]$",
     DESC_OBJ_CLAUSE),
    # manager-family object-side descriptor (v16)
    ("met",
     r"^(?P<subj>[A-Z][a-z]+) met with the manager of "
     r"(?P<key>[A-Z][a-z]+)[.?]$",
     DESC_OBJ_CLAUSE),
]
DESC_OBJ_LITERAL = " the maintainer of "
MGR_DESC_LITERAL = "The manager of "
MGR_DESC_OBJ_LITERAL = " the manager of "

# ---------------------------------------------------------------------------
# ORG-keyed descriptor family (v28): CROSS-SENTENCE appositives keyed by an
# organization — "The Acme engineer met with Bob." refers to the committed
# person most recently stated to WORK AT that org.  This extends the v16
# descriptor-state machinery with a third key family whose keys are
# SURFACE-NORMALIZED (the typo'd-org story):
#
#   * state: every explicit works_at event (person subject, org object)
#     commits (normalize_surface('org', obj) -> person) — the SAME org
#     normalizer the linker uses (lowercase, legal-suffix strip), so a
#     typo'd surface ("Acmee Corp") commits under ITS normalized key
#     ("acmee"), not the canonical entity ("acme"): descriptor resolution
#     is exact-normalized-key, fuzzy unification stays canonicalization's
#     job (reference precedent: XImportResolverPass links by normalized
#     name; DynamicCallLinker's fuzzy closure is a separate pass).
#   * resolution: "The <OrgBase> engineer ..." resolves lower(<OrgBase>)
#     against the committed state of the latest strictly-earlier turn —
#     the standard descriptor rule; unresolvable descriptors emit nothing.
#   * key spaces stay disjoint by shape: org keys are lowercase
#     UNDOTTED single words, module keys lowercase dotted, manager keys
#     Capitalized — one state map serves all three families.
#   * clause = 'definite_org'; the explicit person object feeds referent
#     state (kind-conditional feed, as in every descriptor family);
#     resolved rows feed no state.
#
# Entry: (pred, regex, obj_kind, clause); group 'key' is the org BASE
# surface (capitalized single token — implementations lowercase it).
# Disjointness: no other template admits 'The <Name> engineer' (person
# subjects are single tokens; maintainer/manager descriptors anchor
# their own literals).
# ---------------------------------------------------------------------------
DESC_ORG_CLAUSE = "definite_org"
ORG_STATE_PRED = "works_at"      # the predicate that feeds org-keyed state
DESC_ORG_TEMPLATES = [
    ("met",
     r"^The (?P<key>[A-Z][a-z]+) engineer met with "
     r"(?P<obj>[A-Z][a-z]+)[.?]$",
     "person", DESC_ORG_CLAUSE),
    ("joined",
     r"^The (?P<key>[A-Z][a-z]+) engineer joined "
     r"(?P<obj>[A-Z][A-Za-z ]+?)[.?]$",
     "org", DESC_ORG_CLAUSE),
]
DESC_ORG_LITERAL = " engineer "
COMPILED_DESC_ORG_TEMPLATES = [
    (pred, re.compile(rx), ok, clause)
    for pred, rx, ok, clause in DESC_ORG_TEMPLATES
]
# family-combined prefilter alternations (the engine's memchr-style gate
# before the per-template RE2 kernels)
DESC_ANY_RE = "|".join(re.escape(x) for x in
                       (DESC_LITERAL, MGR_DESC_LITERAL))
DESC_OBJ_ANY_RE = "|".join(re.escape(x) for x in
                           (DESC_OBJ_LITERAL, MGR_DESC_OBJ_LITERAL))

COMPILED_LIST_TEMPLATES = [
    (name, re.compile(rx), pred, mk, ok, clause)
    for name, rx, pred, mk, ok, clause in LIST_TEMPLATES
]
COMPILED_DESC_TEMPLATES = [
    (pred, re.compile(rx), ok, clause)
    for pred, rx, ok, clause in DESC_TEMPLATES
]
COMPILED_DESC_OBJ_TEMPLATES = [
    (pred, re.compile(rx), clause)
    for pred, rx, clause in DESC_OBJ_TEMPLATES
]

# literal prefilters for the multi-relation templates (same discipline as
# _TEMPLATE_LITERALS: memchr scan before the RE2 kernel)
MULTI_TEMPLATE_LITERALS = {
    # v24: tense-alternated templates carry the longest literal common to
    # BOTH verb forms (' work' ⊂ 'work at'/'worked at') — a prefilter must
    # be implied by its regex
    "coord_works_at": (" and ", " work"),
    # ' us' ⊂ 'use'/'used'/'using' (v30 — ' use' is NOT a prefix of
    # ' using'); the ' and ' conjunct keeps the false-positive surface
    # negligible
    "coord_uses": (" and ", " us"),
    "appos_maintainer": ", the maintainer of ",
    "relative_manages": ", who manages ",
    "quoted_uses": ' said "',
    "passive_maintains": " maintained by ",
    "possessive_manager": "'s manager ",
    "coord_orgs": " works at both ",
    "coord3_works_at": (" and ", " work"),
    "quoted_coord_uses": ' said "',
    "vp_coord_maintains_uses": " and uses ",
    "postposed_quoted_uses": '," said ',
    # v29: the aspect-alternated verb group keeps the longest literal
    # common to ALL forms (' introduc' ⊂ 'introduced'/'is introducing')
    "ditrans_introduced": " introduc",
    # tuple = conjunction of literal prefilters (ALL must hit): " me"
    # (⊂ 'met'/'meeting', the longest form-common literal after v29)
    # alone also hits every "met with" sentence — requiring " and " too
    # keeps the reciprocal regex off the hot met-with path
    "recip_met": (" and ", " me"),
    "quoted_ditrans_introduced": " introduc",
    # conjunction: ' daily. ' requires an in-turn boundary right after a
    # uses-sentence, ' maintains ' the second inner relation — together
    # they keep the regex off both the quoted_uses and maintains paths
    "quoted_multi_uses_maintains": (" daily. ", " maintains "),
    # ' manager, ' (with the comma) is disjoint from possessive_manager
    # ("'s manager is") and the manager-descriptor family ('manager of ')
    "appos_manager_pronoun": " manager, ",
}

DEFAULT_SLOT_IDX = 0
DEFAULT_CLAUSE = "main"


def named_group_numbers(rx: str) -> dict[str, int]:
    """name → 1-based capture-group number, by order of appearance.  Valid
    because rule-pack regexes use ONLY named capture groups (non-capturing
    ``(?:`` aside) — the SQL mirror indexes groups by number."""
    return {m.group(1): i + 1
            for i, m in enumerate(re.finditer(r"\(\?P<([a-z0-9]+)>", rx))}


# Pronoun templates: subject is an unresolved pronoun; it resolves to the most
# recently mentioned person (see resolution rule below).
PRONOUN_TEMPLATES = [
    # v33: the pronoun variants of the since-accepting families carry the
    # same optional temporal adjunct (SINCE_OPT); v36 adds the optional
    # hedge adverb (HEDGE_OPT), mirroring the explicit-subject templates
    ("works_at",
     r"^(?:She|He) " + HEDGE_OPT
     + r"(?:no longer )?(?:work(?:s|ed)|is working|was working|"
     r"has worked|had worked) at (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org"),
    ("uses",
     r"^(?:She|He) " + HEDGE_OPT
     + r"(?:no longer )?(?:use(?:s|d)|is using|was using|"
     r"has used|had used) (?P<obj>[a-z0-9_]+) daily"
     + SINCE_OPT + r"[.?]$",
     "tool"),
    # possessive pronoun ("Her manager is Erin"): the REFERENT is the
    # managee, so the relation is the inverse predicate managed_by —
    # subj = resolved referent (the standard pronoun-subject slot),
    # obj = the explicit person.  'manager was' is the past alternant
    # (v24 tense contract above).
    ("managed_by",
     r"^(?:Her|His) manager (?:is|was) (?P<obj>[A-Z][a-z]+)[.?]$",
     "person"),
]

# ---------------------------------------------------------------------------
# PLURAL-pronoun templates (v32): the subject is the plural pronoun "They",
# which resolves to the full committed person SET — the first construct
# whose resolution EXPANDS one event into a variable number of triples
# (the reference analog: closure over a coordinated definition site, the
# way XTypeRecovery fans one unresolved symbol out to every candidate).
# Shared resolution contract (all four implementations):
#
#   * anchor turn: the LATEST strictly-earlier turn of the same
#     conversation carrying any committed person contribution — exactly
#     the singular anchor (the singular referent is max(set), so the two
#     rules share one state stream; per-row contributions stay the
#     standard rule: obj person shadows subj person, resolved rows
#     contribute nothing);
#   * expansion: one triple per DISTINCT person in the anchor turn's
#     contribution set, subj = the member, slot_idx = the member's rank
#     in LEXICOGRAPHIC order (0-based — deterministic, set-derived),
#     clause = 'plural'; a single-member set expands to one triple at
#     slot 0;
#   * no anchor turn ⇒ no emission (the unresolvable-pronoun rule);
#   * plural-RESOLVED rows feed NO state of any family (the resolved-row
#     discipline), so consecutive plural turns co-refer to the same set.
#
# Event-store discriminator: subj IS NULL ∧ desc_key IS NULL ∧
# clause = 'plural' (singular subject-pronoun events keep clause 'main'
# or their construct clause).  The verb groups are the v30 PLURAL aspect
# alternations (are/were/have auxiliaries — already in PROG_RE /
# PAST_RE / PRES_PERFECT_RE, so the attribute kernels need no edits).
# ---------------------------------------------------------------------------
PLURAL_CLAUSE = "plural"

# ---------------------------------------------------------------------------
# ORG-PRONOUN templates (v38): "It acquired Globex Inc." — the engine's
# first NON-PERSON pronoun class.  Shared contract (all four
# implementations):
#
#   * state: every FULLY-EXPLICIT event row (subj AND obj both present
#     at event time) carrying an org-kind slot commits its org SURFACE
#     at its turn — the OBJECT slot shadows the subject slot (a
#     both-org row like acquired commits the object), lexicographic
#     max within a turn (the person-state tie-break).  Pronoun-,
#     plural- or descriptor-RESOLVED rows feed no org state — including
#     the org-pronoun row's own explicit object — so chained "It"
#     turns co-refer (the resolved-row discipline);
#   * resolution: the referent is the committed org surface of the
#     LATEST strictly-earlier turn; none ⇒ no emission.  The resolved
#     row's SUBJECT is the referent surface, subj_kind='org', clause
#     'org_pronoun';
#   * machinery: the state rides the generic descriptor-state map
#     under the reserved key ORG_REF_KEY ('\x02org' — its control
#     character cannot appear in any template capture, so the key
#     space stays disjoint from module/manager/org-engineer keys),
#     and the event is a descriptor-class row (subj NULL ∧ desc_key =
#     ORG_REF_KEY); Stage B resolves it on the existing forward-fill
#     path with zero new exchange machinery;
#   * "It" joins SUBJ_PRONOUNS, so an 'It' captured by any org- or
#     person-subject template slot is a pronoun surface — suppressed
#     from explicit emission and from referent state (dirty-input
#     fallback: an 'It' in a PERSON slot resolves through the person
#     rule, documented; the grammar never generates that shape).
#
# Entry: (pred, regex, obj_kind) — the verb groups carry their v35
# aspect alternations and the v33 adjunct.
# ---------------------------------------------------------------------------
ORG_PRON_CLAUSE = "org_pronoun"
ORG_REF_KEY = "\x02org"
ORG_PRONOUN_TEMPLATES = [
    ("acquired",
     r"^It (?:acquired|is acquiring|was acquiring|has acquired|"
     r"had acquired) (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org"),
    ("partnered",
     r"^It (?:partnered|is partnering|was partnering|has partnered|"
     r"had partnered) with (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org"),
]
COMPILED_ORG_PRONOUN_TEMPLATES = [
    (pred, re.compile(rx), ok) for pred, rx, ok in ORG_PRONOUN_TEMPLATES
]

# ---------------------------------------------------------------------------
# PLURAL-RECIPROCAL templates (v34): "They met." — BOTH slots of the
# symmetric relation come from the committed person set, so resolution
# expands one event into one triple per ORDERED PAIR of distinct members
# (k members ⇒ k·(k-1) triples) — the quadratic analog of the v32 linear
# fan-out (reference precedent: the pairwise closure a symmetric relation
# induces over a coordinated definition site, the recip_met construct
# lifted to anaphora).  Shared resolution contract (all four
# implementations):
#
#   * anchor turn: the v32 rule verbatim (latest strictly-earlier
#     committed person-bearing turn; one state stream serves the
#     singular max-rule, the v32 set rule and this pair rule);
#   * expansion: one triple per ordered pair (a, b), a ≠ b, of the
#     anchor turn's DISTINCT person set — subj = a, obj = b,
#     slot_idx = a's rank in LEXICOGRAPHIC order (the v21 reciprocal's
#     "position of the row's subject" discipline), clause
#     'plural_recip'; a single-member set emits NOTHING (no partner —
#     unlike v32, where one member still yields one triple);
#   * no anchor turn ⇒ no emission; resolved rows feed NO state.
#
# Event-store discriminator: subj IS NULL ∧ obj IS NULL ∧ desc_key IS
# NULL ∧ clause = 'plural_recip' — the first event class with BOTH
# entity slots unresolved (v32 plural rows keep their explicit object).
# The verb alternation is the v29 reciprocal's plural aspect set; no
# other construct anchors '^They (met|...)[.?]$'.
# ---------------------------------------------------------------------------
PLURAL_RECIP_CLAUSE = "plural_recip"
PLURAL_RECIP_TEMPLATES = [
    # v37: the hedge adverb composes with the plural reciprocal — every
    # fanned-out ordered pair carries the sentence's hedged bit
    ("met",
     r"^They " + HEDGE_OPT
     + r"(?:met|are meeting|were meeting|have met|had met)[.?]$"),
]
COMPILED_PLURAL_RECIP_TEMPLATES = [
    (pred, re.compile(rx)) for pred, rx in PLURAL_RECIP_TEMPLATES
]

PLURAL_PRONOUN_TEMPLATES = [
    # v33: the plural variants accept the temporal adjunct too — the
    # since_year value is a PAYLOAD attribute, so it must survive the
    # plural set expansion unchanged on every fanned-out row
    ("works_at",
     r"^They " + HEDGE_OPT
     + r"(?:no longer )?(?:work(?:ed)?|are working|were working|"
     r"have worked|had worked) at (?P<obj>[A-Z][A-Za-z ]+?)"
     + SINCE_OPT + r"[.?]$",
     "org"),
    ("uses",
     r"^They " + HEDGE_OPT
     + r"(?:no longer )?(?:use(?:d)?|are using|were using|"
     r"have used|had used) (?P<obj>[a-z0-9_]+) daily"
     + SINCE_OPT + r"[.?]$",
     "tool"),
]
COMPILED_PLURAL_PRONOUN_TEMPLATES = [
    (pred, re.compile(rx), ok) for pred, rx, ok in PLURAL_PRONOUN_TEMPLATES
]

# OBJECT-pronoun templates (v9): the pronoun fills the OBJECT slot
# ("Alice met with her.") and resolves to the same committed referent as
# subject pronouns; the explicit SUBJECT both anchors the relation and
# feeds referent state.  Event-row discriminator (store invariant): obj
# IS NULL ∧ pred IS NOT NULL ⇔ object-pronoun event (subj IS NULL keeps
# meaning subject-pronoun event).  Lowercase her/him keeps these
# disjoint from the capitalized person-object templates.
PRONOUN_OBJECT_TEMPLATES = [
    ("met",
     r"^(?P<subj>[A-Z][a-z]+) met with (?:her|him)[.?]$",
     "person"),
    ("manages",
     r"^(?P<subj>[A-Z][a-z]+) manages (?:her|him)[.?]$",
     "person"),
]

COMPILED_PRONOUN_OBJECT_TEMPLATES = [
    (pred, re.compile(rx), ok) for pred, rx, ok in PRONOUN_OBJECT_TEMPLATES
]

# OBJECT pronouns INSIDE quoted speech (v18): 'X said "Bob met with
# her."' — the v11 quoting-turn referent-scope contract applied to the
# object-pronoun machinery: the pronoun resolves to the committed
# referent of the latest strictly-earlier turn; the explicit INNER
# subject anchors the relation and feeds referent state; the SPEAKER is
# not an emitted slot (no commit, no shadowing).  Emissions carry
# clause='quoted'.  Entry: (pred, regex, obj_kind); groups speaker+subj.
QUOTED_PRONOUN_OBJECT_TEMPLATES = [
    ("met",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) met with '
     r'(?:her|him)\."$',
     "person"),
    ("manages",
     r'^(?P<speaker>[A-Z][a-z]+) said "(?P<subj>[A-Z][a-z]+) manages '
     r'(?:her|him)\."$',
     "person"),
]
COMPILED_QUOTED_PRONOUN_OBJECT_TEMPLATES = [
    (pred, re.compile(rx), ok)
    for pred, rx, ok in QUOTED_PRONOUN_OBJECT_TEMPLATES
]
QUOTED_CLAUSE = "quoted"

# Attribute predicates over a matched sentence (shared contract):
NEGATION_MARK = "no longer "      # substring test on the matched sentence
QUESTION_MARK = "?"               # sentence suffix test
# Hedge / modality attribute (v36) — the SIXTH relation attribute
# (negated / in_question / is_past / aspect / since_year / hedged; the
# fork's structural-attribute family per
# ``DependencyJsonGenerator.scala:278-292``).  A 'reportedly' adverb
# marks the relation as second-hand/unconfirmed ("Alice reportedly
# works at Acme Corp.") — the provenance-weakening signal the quoted
# clause carries structurally, here as a lexical modifier.  Shared
# contract (sentence-level substring test, exactly the NEGATION_MARK
# discipline — every emission of one sentence carries the same value):
#
#   hedged(sent) = contains(sent, 'reportedly ')
#
# The templates that ACCEPT the adverb are the four alternating
# singular families (works_at / uses / manages / maintains) and their
# singular+plural pronoun variants — '(?:reportedly )?' before the
# (optional) negation ('Alice reportedly no longer works at X.').
# Other families simply never produce the token, so the contract stays
# total; the kernel is lexical, so dirty input with a stray
# 'reportedly' still classifies consistently in all four
# implementations.
HEDGE_MARK = "reportedly "

# Pronoun resolution rule (shared contract):
#   The referent of a pronoun in turn t is determined by the LATEST turn with
#   turn_idx < t (same conversation) containing any person-kind slot of a
#   template match; within one sentence the object slot shadows the subject
#   slot (so each matched sentence contributes at most one person).  If that
#   turn carries several person slots (multi-match turns, or duplicate
#   turn_idx rows in dirty input), the LEXICOGRAPHICALLY GREATEST person
#   surface wins — a deterministic tie-break independent of row arrival
#   order.  Resolved pronoun triples do not update the referent state.
#   Unresolvable pronouns emit no triple.
#
# Quoted-speech referent-scope contract (v11): a pronoun INSIDE quoted
#   speech ('Alice said "She uses search daily."') resolves in the QUOTING
#   turn's scope — the standard committed referent of the latest
#   strictly-earlier turn.  The SPEAKER is not an emitted slot, so it
#   neither shadows the referent nor commits state (consistent with every
#   quoted template since v4); emitted NON-pronoun person slots inside the
#   quote DO commit state as usual.  This is a deliberate simplification —
#   true reported-speech deixis can bind the pronoun inside the quotation's
#   own discourse — chosen because it keeps resolution a pure function of
#   the committed turn-state stream (the same property every implementation
#   relies on); the clause='quoted' attribute preserves enough structure
#   for a consumer to re-bind under a different convention.

COMPILED_TEMPLATES = [
    (pred, re.compile(rx), sk, ok) for pred, rx, sk, ok in TEMPLATES
]
COMPILED_PRONOUN_TEMPLATES = [
    (pred, re.compile(rx), ok) for pred, rx, ok in PRONOUN_TEMPLATES
]
COMPILED_MULTI_TEMPLATES = [
    (name, re.compile(rx), emissions)
    for name, rx, emissions in MULTI_TEMPLATES
]

# Tool-invocation fact: every role='tool' turn yields
#   (conv:<conv_id>, invoked, tool:<tool>)
INVOKED_PRED = "invoked"

# ---------------------------------------------------------------------------
# Untyped-mention template — the input of the kind-recovery pass (the
# XTypeRecovery analog, ``x2cpg/passes/frontend/XTypeRecovery.scala:23-110``:
# bounded-iteration inference assigning a type to symbols whose declaration
# carries none, from the contexts the same symbol appears in).  A
# "mentioned" sentence names an entity WITHOUT revealing its kind; the
# recovery pass (stages/kindrec.py) types it from evidence — other
# mentions of the SAME surface in typed template slots — in two bounded
# rounds: conversation-local evidence first (closest scope wins), then the
# global surface vocabulary.  Deliberately NOT part of TEMPLATES: like the
# reference's pass it is an overlay over the extraction events, not part
# of the frontend grammar, so it feeds canonicalization but never the
# surface-triple stream or referent state.
# ---------------------------------------------------------------------------
MENTIONED_PRED = "mentioned"
MENTIONED_RE = (r"^(?P<subj>[A-Z][a-z]+) mentioned "
                r"(?P<obj>[A-Za-z][A-Za-z0-9_. ]*?)[.?]$")
MENTIONED_LITERAL = " mentioned "
UNKNOWN_KIND = "unknown"
# surfaces synth uses for the UNRECOVERABLE regime (never appear in any
# typed slot anywhere — the mention stays an untyped stub, round 0)
NEVER_TYPED = ["Quokka Ventures", "Zephyr Consortium", "Nimbus Collective"]


# ---------------------------------------------------------------------------
# Normalizers (the FULL_NAME discipline — reference:
# x2cpg/passes/frontend/Dereference.scala:1-35 strips type decoration before
# index lookup; we strip case/punctuation/legal suffixes before linking)
# ---------------------------------------------------------------------------

def normalize_surface(kind: str, surface: str) -> str:
    """Canonical-key normalization for a mention surface — delegates to the
    vectorized kernel (``link.normalize_arrays``) on a 1-row array so the
    scalar and batch paths CANNOT diverge.  (A hand-written Python twin
    diverged on Unicode edge cases — 'İ' case expansion, NBSP vs RE2's
    ASCII ``\\s`` — caught by the hypothesis lockstep test; the independent
    re-implementation of normalization semantics lives in the DuckDB
    oracle SQL, ``extract/sqlgen.py::_norm_expr``.)"""
    import pyarrow as pa

    from ..stages.link import normalize_arrays  # lazy: avoids import cycle

    return normalize_arrays(pa.array([kind]), pa.array([surface]))[0].as_py()


def char_shingles(s: str, k: int = 2) -> set[str]:
    """Padded character k-shingles used for fuzzy org matching."""
    p = f"^{s}$"
    if len(p) <= k:
        return {p}
    return {p[i:i + k] for i in range(len(p) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# kinds that go through fuzzy MinHash/LSH linking; all others link by exact
# normalized key only.
FUZZY_KINDS = {"org"}
FUZZY_JACCARD_THRESHOLD = 0.5

# kinds that are natural keys, never linked/canonicalized: their mentions
# resolve to themselves (the FILE-node get-or-create discipline,
# ``FileCreationPass.scala:16-58``) and must not enter the entity vocabulary
# — at scale they are corpus-sized, not vocabulary-sized.
NONLINK_KINDS = {"conv"}
