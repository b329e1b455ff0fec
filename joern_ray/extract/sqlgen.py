"""DuckDB oracle-SQL generators for the transcript extraction pipeline.

Built programmatically from the shared rule pack (joern_ray.functions.rules)
so the patterns have a single source of truth; the SQL *implementation*
(regexp kernels + window functions) is independent of the Ray implementation
(Arrow kernels + bucketed forward-fill), which is what makes the comparison
meaningful — the analog of the reference's ``compareJson.py`` dual-run
harness.
"""

from __future__ import annotations

from ..functions import rules as R


def _plain(rx: str) -> str:
    """Named capture groups → plain groups (regexp_extract indexes by
    number; rule-pack regexes use ONLY named captures, so group N = Nth
    named group by appearance — see rules.named_group_numbers)."""
    import re as _re
    return _re.sub(r"\(\?P<[a-z0-9]+>", "(", rx).replace("'", "''")


def _sents_cte(rel: str) -> str:
    """Sentence explosion mirroring rules.split_sentences (RE2 both
    sides): mark the boundary, split, then the v23 quote-parity repair —
    a part whose preceding in-turn double-quote count is odd started
    inside an open quotation and merges back into its predecessor with
    the one space the mark consumed (window cumsum → segment ids →
    ordered string_agg)."""
    return f"""(
      SELECT conv_id, turn_idx,
             string_agg(part, ' ' ORDER BY pi) AS sent,
             CAST(seg - 1 AS INTEGER) AS sent_idx
      FROM (
        SELECT conv_id, turn_idx, part, pi,
               SUM(CASE WHEN cumq % 2 = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY conv_id, turn_idx ORDER BY pi) AS seg
        FROM (
          SELECT conv_id, turn_idx, part, pi,
                 COALESCE(SUM(len(part) - len(replace(part, '"', '')))
                   OVER (PARTITION BY conv_id, turn_idx ORDER BY pi
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS cumq
          FROM (
            SELECT conv_id, turn_idx, unnest(sl) AS part,
                   CAST(unnest(range(len(sl))) AS INTEGER) AS pi
            FROM (SELECT conv_id, turn_idx,
                         regexp_split_to_array(
                           regexp_replace(text, '([.?!]) ',
                                          '\\1' || chr(30), 'g'),
                           chr(30)) AS sl
                  FROM {rel}))))
      GROUP BY conv_id, turn_idx, seg)"""


def _attr_cols() -> str:
    from ..functions import rules as R
    past = R.PAST_RE.replace("'", "''")
    ppas = R.PRES_PASSIVE_RE.replace("'", "''")
    pperf = R.PRES_PERFECT_RE.replace("'", "''")
    prog = R.PROG_RE.replace("'", "''")
    perf = R.PERF_RE.replace("'", "''")
    since = _plain(R.SINCE_RE)
    return ("sent_idx, contains(sent, 'no longer ') AS negated, "
            "ends_with(sent, '?') AS in_question, "
            f"(regexp_matches(sent, '{past}') AND NOT "
            f"regexp_matches(sent, '{ppas}') AND NOT "
            f"regexp_matches(sent, '{pperf}')) AS is_past, "
            f"CASE WHEN regexp_matches(sent, '{prog}') "
            f"THEN '{R.ASPECT_PROG}' "
            f"WHEN regexp_matches(sent, '{perf}') "
            f"THEN '{R.ASPECT_PERF}' "
            f"ELSE '{R.ASPECT_SIMPLE}' END AS aspect, "
            # v33 temporal adjunct: int year of a sentence-final
            # 'since <year>', NULL when absent (the shared SINCE_RE)
            f"CASE WHEN regexp_matches(sent, '{since}') "
            f"THEN CAST(regexp_extract(sent, '{since}', 1) AS INTEGER) "
            f"END AS since_year, "
            # v36 hedge attribute (the NEGATION_MARK substring discipline)
            f"contains(sent, '{R.HEDGE_MARK}') AS hedged")


def events_sql(rel: str) -> str:
    """All extraction events with kinds + etype + attributes — the Stage-A
    analog, per SENTENCE (multi-sentence turns explode first)."""
    parts = []
    # a template match is suppressed iff an actual pronoun template matched
    # the same sentence (mirrors extract_events' pron_matched mask exactly —
    # a broad '^(She|He) ' prefix test would over-exclude e.g. a subject
    # surface of 'She Devices')
    # v32: plural-pronoun matches join the suppression alternation (the
    # SQL mirror of the engine's pron_matched mask)
    pron_any = " OR ".join(
        [f"regexp_matches(sent, '{_plain(rx)}')"
         for _, rx, _ in (R.PRONOUN_TEMPLATES
                          + R.PLURAL_PRONOUN_TEMPLATES
                          # v38 org-pronoun matches join the suppression
                          # alternation (the engine's pron_matched mask)
                          + R.ORG_PRONOUN_TEMPLATES)]
        # v34 plural-reciprocal matches join the suppression alternation
        + [f"regexp_matches(sent, '{_plain(rx)}')"
           for _, rx in R.PLURAL_RECIP_TEMPLATES])
    # the shared subject-pronoun surface set (rules.SUBJ_PRONOUNS) and the
    # object-slot set (rules.OBJ_PRONOUNS — adds lowercase forms, v25)
    pron_in = ", ".join(f"'{p}'" for p in R.SUBJ_PRONOUNS)
    opron_in = ", ".join(f"'{p}'" for p in R.OBJ_PRONOUNS)
    sents = _sents_cte(rel)
    for pred, rx, ok in R.PRONOUN_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun' AS etype,
               CAST(NULL AS VARCHAR) AS subj, '{pred}' AS pred,
               regexp_extract(sent, '{rxs}', 1) AS obj,
               'person' AS subj_kind, '{ok}' AS obj_kind, {_attr_cols()},
               {R.DEFAULT_SLOT_IDX} AS slot_idx,
               '{R.DEFAULT_CLAUSE}' AS clause,
               CAST(NULL AS VARCHAR) AS desc_key
        FROM {sents} WHERE regexp_matches(sent, '{rxs}')""")
    # plural-pronoun templates (v32): etype 'plural' — subj NULL until
    # the set expansion in resolved_triples_sql fans it out over the
    # anchor turn's distinct committed persons
    for pred, rx, ok in R.PLURAL_PRONOUN_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'plural' AS etype,
               CAST(NULL AS VARCHAR) AS subj, '{pred}' AS pred,
               regexp_extract(sent, '{rxs}', 1) AS obj,
               'person' AS subj_kind, '{ok}' AS obj_kind, {_attr_cols()},
               {R.DEFAULT_SLOT_IDX} AS slot_idx,
               '{R.PLURAL_CLAUSE}' AS clause,
               CAST(NULL AS VARCHAR) AS desc_key
        FROM {sents} WHERE regexp_matches(sent, '{rxs}')""")
    # plural-reciprocal templates (v34): etype 'plural_pair' — BOTH
    # slots NULL until the ordered-pair expansion in
    # resolved_triples_sql fans the event out over the anchor set
    for pred, rx in R.PLURAL_RECIP_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'plural_pair' AS etype,
               CAST(NULL AS VARCHAR) AS subj, '{pred}' AS pred,
               CAST(NULL AS VARCHAR) AS obj,
               'person' AS subj_kind, 'person' AS obj_kind, {_attr_cols()},
               {R.DEFAULT_SLOT_IDX} AS slot_idx,
               '{R.PLURAL_RECIP_CLAUSE}' AS clause,
               CAST(NULL AS VARCHAR) AS desc_key
        FROM {sents} WHERE regexp_matches(sent, '{rxs}')""")
    # object-pronoun templates ("Alice met with her."): subject captured,
    # object NULL until the shared resolution window fills it
    for pred, rx, ok in R.PRONOUN_OBJECT_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun_obj' AS etype,
               regexp_extract(sent, '{rxs}', 1) AS subj, '{pred}' AS pred,
               CAST(NULL AS VARCHAR) AS obj,
               'person' AS subj_kind, '{ok}' AS obj_kind, {_attr_cols()},
               {R.DEFAULT_SLOT_IDX} AS slot_idx,
               '{R.DEFAULT_CLAUSE}' AS clause, CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', 1) NOT IN ({pron_in})""")
    # object pronouns INSIDE quoted speech (v18): same etype as the
    # plain object-pronoun arm, clause 'quoted'
    for pred, rx, ok in R.QUOTED_PRONOUN_OBJECT_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun_obj' AS etype,
               regexp_extract(sent, '{rxs}', {nums["subj"]}), '{pred}',
               CAST(NULL AS VARCHAR),
               'person', '{ok}', {_attr_cols()},
               {R.DEFAULT_SLOT_IDX}, '{R.QUOTED_CLAUSE}',
               CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {nums["subj"]})
              NOT IN ({pron_in})""")
    for pred, rx, sk, ok in R.TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'triple',
               regexp_extract(sent, '{rxs}', 1), '{pred}',
               regexp_extract(sent, '{rxs}', 2), '{sk}', '{ok}',
               {_attr_cols()}, {R.DEFAULT_SLOT_IDX}, '{R.DEFAULT_CLAUSE}',
               CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', 1) NOT IN ({pron_in})
          AND NOT ({pron_any})""")
    # multi-relation templates: one arm per EMISSION (groups by number via
    # rules.named_group_numbers — the Ray side extracts named groups from
    # the identical regex, so the pattern text has one source of truth)
    for name, rx, emissions in R.MULTI_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        for pred, subj_g, sk, obj_g, ok, slot, clause in emissions:
            # v21 object-pronoun rule: a pronoun in a person OBJECT slot
            # diverts the emission to the 'pronoun_obj' class (and drops
            # it from the explicit and pronoun-subject arms)
            obj_not_pron = (
                f"""
          AND regexp_extract(sent, '{rxs}', {nums[obj_g]})
              NOT IN ({opron_in})""" if ok == "person" else "")
            parts.append(f"""
        SELECT conv_id, turn_idx, 'triple',
               regexp_extract(sent, '{rxs}', {nums[subj_g]}), '{pred}',
               regexp_extract(sent, '{rxs}', {nums[obj_g]}), '{sk}', '{ok}',
               {_attr_cols()}, {slot}, '{clause}', CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {nums[subj_g]})
              NOT IN ({pron_in}){obj_not_pron}
          AND NOT ({pron_any})""")
            if ok == 'person':
                parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun_obj',
               regexp_extract(sent, '{rxs}', {nums[subj_g]}), '{pred}',
               CAST(NULL AS VARCHAR), '{sk}', '{ok}',
               {_attr_cols()}, {slot}, '{clause}', CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {nums[subj_g]})
              NOT IN ({pron_in})
          AND regexp_extract(sent, '{rxs}', {nums[obj_g]})
              IN ({opron_in})
          AND NOT ({pron_any})""")
            if sk != 'person':
                continue
            # pronoun in a person subject slot: a PRONOUN event carrying
            # the emission's slot/clause (resolved by the shared window)
            parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun',
               CAST(NULL AS VARCHAR), '{pred}',
               regexp_extract(sent, '{rxs}', {nums[obj_g]}), '{sk}', '{ok}',
               {_attr_cols()}, {slot}, '{clause}', CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {nums[subj_g]})
              IN ({pron_in}){obj_not_pron}
          AND NOT ({pron_any})""")
    # LIST templates (open-ended coordination, v12): the list head is ONE
    # regex capture split on the shared separator; DuckDB's parallel-unnest
    # idiom (the _sents_cte trick) zips members with their slot ordinal.
    # The trailing conjunct is its own arm at slot len(head).
    sep = R.LIST_SEP.replace("'", "''")
    for name, rx, pred, mk, ok, clause in R.LIST_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        ln, an, on = nums["list"], nums["last"], nums["obj"]
        inner = f"""(
          SELECT conv_id, turn_idx, sent_idx, negated, in_question,
                 is_past, aspect, since_year, hedged,
                 unnest(ml) AS member,
                 CAST(unnest(range(len(ml))) AS INTEGER) AS slot, obj0
          FROM (SELECT conv_id, turn_idx, {_attr_cols()},
                       string_split(regexp_extract(sent, '{rxs}', {ln}),
                                    '{sep}') AS ml,
                       regexp_extract(sent, '{rxs}', {on}) AS obj0
                FROM {sents}
                WHERE regexp_matches(sent, '{rxs}')
                  AND NOT ({pron_any})))"""
        parts.append(f"""
        SELECT conv_id, turn_idx, 'triple', member, '{pred}', obj0,
               '{mk}', '{ok}', sent_idx, negated, in_question, is_past,
               aspect, since_year, hedged, slot, '{clause}',
               CAST(NULL AS VARCHAR)
        FROM {inner} WHERE member NOT IN ({pron_in})""")
        parts.append(f"""
        SELECT conv_id, turn_idx, 'triple',
               regexp_extract(sent, '{rxs}', {an}), '{pred}',
               regexp_extract(sent, '{rxs}', {on}), '{mk}', '{ok}',
               {_attr_cols()},
               CAST(len(string_split(regexp_extract(sent, '{rxs}', {ln}),
                                     '{sep}')) AS INTEGER),
               '{clause}', CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {an}) NOT IN ({pron_in})
          AND NOT ({pron_any})""")
        if mk == "person":
            parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun', CAST(NULL AS VARCHAR),
               '{pred}', obj0, '{mk}', '{ok}',
               sent_idx, negated, in_question, is_past, aspect,
               since_year, hedged, slot, '{clause}', CAST(NULL AS VARCHAR)
        FROM {inner} WHERE member IN ({pron_in})""")
            parts.append(f"""
        SELECT conv_id, turn_idx, 'pronoun', CAST(NULL AS VARCHAR),
               '{pred}', regexp_extract(sent, '{rxs}', {on}), '{mk}', '{ok}',
               {_attr_cols()},
               CAST(len(string_split(regexp_extract(sent, '{rxs}', {ln}),
                                     '{sep}')) AS INTEGER),
               '{clause}', CAST(NULL AS VARCHAR)
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {an}) IN ({pron_in})
          AND NOT ({pron_any})""")
    # definite-description templates (v12): descriptor events — subj NULL,
    # desc_key = the module the descriptor resolves against in the shared
    # module-state window of resolved_triples_sql
    for pred, rx, ok, clause in R.DESC_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'desc', CAST(NULL AS VARCHAR), '{pred}',
               regexp_extract(sent, '{rxs}', {nums["obj"]}),
               'person', '{ok}', {_attr_cols()},
               {R.DEFAULT_SLOT_IDX}, '{clause}',
               regexp_extract(sent, '{rxs}', {nums["key"]})
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}') AND NOT ({pron_any})""")
    # ORG-keyed descriptors (v28): etype 'desc', desc_key = the
    # LOWERCASED org base — resolved in the shared module-state window
    # against the normalized-surface works_at state (mm CTE)
    for pred, rx, ok, clause in R.DESC_ORG_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'desc', CAST(NULL AS VARCHAR), '{pred}',
               regexp_extract(sent, '{rxs}', {nums["obj"]}),
               'person', '{ok}', {_attr_cols()},
               {R.DEFAULT_SLOT_IDX}, '{clause}',
               lower(regexp_extract(sent, '{rxs}', {nums["key"]}))
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}') AND NOT ({pron_any})""")
    # ORG-pronoun templates (v38): etype 'desc' with subj_kind 'org' and
    # desc_key = the reserved ORG_REF_KEY — resolved in the SAME
    # module-state window against the org referent state (mm CTE's v38
    # arm); the resolved subject's kind rides the event row
    for pred, rx, ok in R.ORG_PRONOUN_TEMPLATES:
        rxs = _plain(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'desc', CAST(NULL AS VARCHAR), '{pred}',
               regexp_extract(sent, '{rxs}', 1),
               'org', '{ok}', {_attr_cols()},
               {R.DEFAULT_SLOT_IDX}, '{R.ORG_PRON_CLAUSE}',
               chr(2) || 'org'
        FROM {sents} WHERE regexp_matches(sent, '{rxs}')""")
    # OBJECT-side definite descriptions (v15): explicit subject captured,
    # obj NULL until the module-state window fills it; pronoun subjects
    # skip (the plain-template rule)
    for pred, rx, clause in R.DESC_OBJ_TEMPLATES:
        rxs = _plain(rx)
        nums = R.named_group_numbers(rx)
        parts.append(f"""
        SELECT conv_id, turn_idx, 'desc_obj',
               regexp_extract(sent, '{rxs}', {nums["subj"]}), '{pred}',
               CAST(NULL AS VARCHAR),
               'person', 'person', {_attr_cols()},
               {R.DEFAULT_SLOT_IDX}, '{clause}',
               regexp_extract(sent, '{rxs}', {nums["key"]})
        FROM {sents}
        WHERE regexp_matches(sent, '{rxs}')
          AND regexp_extract(sent, '{rxs}', {nums["subj"]})
              NOT IN ({pron_in})
          AND NOT ({pron_any})""")
    parts.append(f"""
        SELECT conv_id, turn_idx, 'triple', conv_id, '{R.INVOKED_PRED}',
               tool, 'conv', 'tool', 0, FALSE, FALSE, FALSE,
               '{R.ASPECT_SIMPLE}', CAST(NULL AS INTEGER), FALSE,
               {R.DEFAULT_SLOT_IDX}, '{R.DEFAULT_CLAUSE}',
               CAST(NULL AS VARCHAR)
        FROM {rel} WHERE role = 'tool' AND tool IS NOT NULL""")
    return " UNION ALL ".join(parts)


def resolved_triples_sql(rel: str) -> str:
    """Surface triples with pronouns resolved (the shared resolution rule,
    rules.py: referent = max person slot of the LATEST strictly-earlier
    turn carrying any person slot; resolved triples don't update the
    referent; unresolvable pronouns drop).  The window runs over one row
    per TURN (turn-level state commit) so duplicate-turn_idx rows cannot
    make the result order-dependent."""
    return f"""
    WITH ev AS MATERIALIZED ({events_sql(rel)}),
    st AS (
      SELECT *,
             CASE WHEN etype = 'triple' THEN
               CASE WHEN obj_kind = 'person' THEN obj
                    WHEN subj_kind = 'person' THEN subj END
             WHEN etype = 'pronoun_obj' THEN subj
             WHEN etype = 'desc' THEN
               CASE WHEN obj_kind = 'person' THEN obj END
             WHEN etype = 'desc_obj' THEN subj
             END AS person
      FROM ev),
    tp AS (
      SELECT conv_id, turn_idx, max(person) AS turn_person
      FROM st GROUP BY conv_id, turn_idx),
    tr AS (
      SELECT conv_id, turn_idx,
             last_value(turn_person IGNORE NULLS) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_person
      FROM tp),
    -- v32 plural-pronoun machinery: the anchor turn (latest strictly-
    -- earlier person-bearing turn — the same state stream tr reads its
    -- max from) and the per-turn DISTINCT person set it expands over
    ps AS (
      SELECT DISTINCT conv_id, turn_idx, person FROM st
      WHERE person IS NOT NULL),
    tra AS (
      SELECT conv_id, turn_idx,
             last_value(CASE WHEN turn_person IS NOT NULL
                             THEN turn_idx END IGNORE NULLS) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS anchor_turn
      FROM tp),
    -- module-keyed maintainer state (definite-description resolution):
    -- committed = latest strictly-earlier turn's max EXPLICIT maintainer
    -- of the descriptor's module (pronoun-resolved rows never feed it)
    mm AS (
      SELECT conv_id, mkey, turn_idx, max(subj) AS turn_m FROM (
        SELECT conv_id, obj AS mkey, turn_idx, subj
        FROM ev
        WHERE etype = 'triple'
          AND pred IN ({", ".join(f"'{p}'" for p in R.DESC_STATE_PREDS)})
          AND subj IS NOT NULL AND obj IS NOT NULL
        UNION ALL
        -- v28 org-keyed family: explicit works_at(person, org) commits
        -- under the NORMALIZED org surface (the typo'd-org contract)
        SELECT conv_id, {_norm_expr("obj", "obj_kind")}, turn_idx, subj
        FROM ev
        WHERE etype = 'triple' AND pred = '{R.ORG_STATE_PRED}'
          AND obj_kind = 'org'
          AND subj IS NOT NULL AND obj IS NOT NULL
        UNION ALL
        -- v38 org REFERENT state: every fully-explicit row with an
        -- org-kind slot commits its org SURFACE under the reserved key
        -- (object shadows subject; the max() above gives the turn max)
        SELECT conv_id, chr(2) || 'org', turn_idx,
               CASE WHEN obj_kind = 'org' THEN obj ELSE subj END
        FROM ev
        WHERE etype = 'triple'
          AND (obj_kind = 'org' OR subj_kind = 'org')
          AND subj IS NOT NULL AND obj IS NOT NULL)
      GROUP BY 1, 2, 3),
    mdom AS (
      SELECT DISTINCT conv_id, mkey, turn_idx FROM (
        SELECT conv_id, mkey, turn_idx FROM mm
        UNION ALL
        SELECT conv_id, desc_key, turn_idx FROM ev
        WHERE etype IN ('desc', 'desc_obj'))),
    mtr AS (
      SELECT d.conv_id, d.mkey, d.turn_idx,
             last_value(mm.turn_m IGNORE NULLS) OVER (
               PARTITION BY d.conv_id, d.mkey ORDER BY d.turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_m
      FROM mdom d LEFT JOIN mm
        ON mm.conv_id = d.conv_id AND mm.mkey = d.mkey
       AND mm.turn_idx = d.turn_idx)
    -- the union below is wrapped in a derived table so the CTE body's
    -- top level stays ONE select: consumers embed this query inside
    -- WITH RECURSIVE (reach/paths oracles), where a top-level UNION ALL
    -- would be parsed as an anchor/recursive-part split and lose the
    -- inner CTE scope ("Table st does not exist")
    SELECT * FROM (
    SELECT st.conv_id, st.turn_idx,
           CASE WHEN etype = 'pronoun' THEN tr.prev_person
                WHEN etype = 'desc' THEN mtr.prev_m
                ELSE st.subj END AS subj,
           pred,
           CASE WHEN etype = 'pronoun_obj' THEN tr.prev_person
                WHEN etype = 'desc_obj' THEN mtr.prev_m
                ELSE obj END AS obj,
           subj_kind, obj_kind, sent_idx, negated, in_question, is_past,
           aspect, since_year, hedged, slot_idx, clause
    FROM st JOIN tr
      ON st.conv_id = tr.conv_id AND st.turn_idx = tr.turn_idx
    LEFT JOIN mtr
      ON st.conv_id = mtr.conv_id AND st.desc_key = mtr.mkey
     AND st.turn_idx = mtr.turn_idx
    WHERE etype = 'triple'
       OR (etype IN ('pronoun', 'pronoun_obj')
           AND tr.prev_person IS NOT NULL)
       OR (etype IN ('desc', 'desc_obj') AND mtr.prev_m IS NOT NULL)
    UNION ALL
    -- v32 plural expansion: one row per DISTINCT person of the anchor
    -- turn, slot_idx = lexicographic rank (row_number over the set);
    -- no anchor turn ⇒ the JOIN drops the event (unresolvable rule)
    SELECT pl.conv_id, pl.turn_idx, ps.person AS subj, pl.pred,
           pl.obj, pl.subj_kind, pl.obj_kind, pl.sent_idx, pl.negated,
           pl.in_question, pl.is_past, pl.aspect, pl.since_year, pl.hedged,
           CAST(row_number() OVER (
             PARTITION BY pl.conv_id, pl.turn_idx, pl.sent_idx,
                          pl.pred, pl.obj
             ORDER BY ps.person) - 1 AS INTEGER) AS slot_idx,
           pl.clause
    FROM (SELECT st.*, tra.anchor_turn
          FROM st JOIN tra ON st.conv_id = tra.conv_id
                          AND st.turn_idx = tra.turn_idx
          WHERE etype = 'plural') pl
    JOIN ps ON ps.conv_id = pl.conv_id
           AND ps.turn_idx = pl.anchor_turn
    UNION ALL
    -- v34 plural-reciprocal expansion: one row per ORDERED PAIR of
    -- distinct anchor-set members (members × members, diagonal
    -- dropped); slot_idx = the SUBJECT member's lexicographic rank
    -- (dense_rank collapses the k-1 b-partners of one a — and keeps
    -- duplicate-event copies rank-stable, unlike row_number)
    SELECT pl.conv_id, pl.turn_idx, a.person AS subj, pl.pred,
           b.person AS obj, pl.subj_kind, pl.obj_kind, pl.sent_idx,
           pl.negated, pl.in_question, pl.is_past, pl.aspect,
           pl.since_year, pl.hedged,
           CAST(dense_rank() OVER (
             PARTITION BY pl.conv_id, pl.turn_idx, pl.sent_idx, pl.pred
             ORDER BY a.person) - 1 AS INTEGER) AS slot_idx,
           pl.clause
    FROM (SELECT st.*, tra.anchor_turn
          FROM st JOIN tra ON st.conv_id = tra.conv_id
                          AND st.turn_idx = tra.turn_idx
          WHERE etype = 'plural_pair') pl
    JOIN ps a ON a.conv_id = pl.conv_id
             AND a.turn_idx = pl.anchor_turn
    JOIN ps b ON b.conv_id = pl.conv_id
             AND b.turn_idx = pl.anchor_turn
             AND b.person <> a.person
    ) AS resolved_u
    """


def _norm_expr(col: str, kind_col: str) -> str:
    """SQL mirror of link.normalize_arrays / rules.normalize_surface."""
    low = f"trim(lower({col}))"
    stripped = (f"regexp_replace({low}, "
                r"'\b(corp|corporation|inc|labs|llc|ltd|the|group)\b'"
                f", '', 'g')")
    squeezed = rf"trim(regexp_replace({stripped}, '\s+', ' ', 'g'))"
    org = f"CASE WHEN {squeezed} = '' THEN {low} ELSE {squeezed} END"
    return f"CASE WHEN {kind_col} = 'org' THEN {org} ELSE {low} END"


def entities_exact_sql(rel: str) -> str:
    """Entity directory restricted to exact-key kinds (everything but the
    fuzzy LSH/union-find kinds, which are not SQL-expressible): canonical
    form is the normalized key itself."""
    from ..functions import rules as R
    excluded = sorted(R.FUZZY_KINDS | R.NONLINK_KINDS)
    ex_list = ", ".join(f"'{k}'" for k in excluded)
    return f"""
    WITH resolved AS ({resolved_triples_sql(rel)}),
    m AS (
      SELECT subj_kind AS kind, {_norm_expr('subj', 'subj_kind')} AS norm
      FROM resolved
      UNION ALL
      SELECT obj_kind, {_norm_expr('obj', 'obj_kind')} FROM resolved)
    SELECT DISTINCT kind, norm, norm AS canonical
    FROM m WHERE kind NOT IN ({ex_list})
    """


def mention_counts_sql(rel: str) -> str:
    """(kind, norm) → mention count over both slots of resolved triples."""
    return f"""
    WITH resolved AS ({resolved_triples_sql(rel)}),
    m AS (
      SELECT subj_kind AS kind, {_norm_expr('subj', 'subj_kind')} AS norm
      FROM resolved
      UNION ALL
      SELECT obj_kind, {_norm_expr('obj', 'obj_kind')} FROM resolved)
    SELECT kind, norm, count(*) AS n_mentions FROM m GROUP BY 1, 2
    """
