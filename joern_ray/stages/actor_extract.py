"""Actor-pool extraction stage — the stateful-parser discipline.

The reference holds ONE parser instance per pass and shares it across all
``runOnPart`` calls (``c2cpg/passes/AstCreationPass.scala:24``); the Ray
analog is a callable CLASS passed to ``map_batches(Cls, concurrency=N)``:
the "model" (compiled regex rules + entity gazetteer) is built once per
actor in ``__init__``, each batch only pays ``__call__``.

``TurnEventExtractor`` produces byte-identical events to the stateless
``extract.extract_events`` (tested) — it exists as the extension point for
genuinely expensive models (NER, tokenizers), where per-batch setup would
dominate.  Swap the fake gazetteer for a real model load and nothing else
changes.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from ..functions import rules as R
from . import extract as X


class TurnEventExtractor:
    """map_batches(TurnEventExtractor, concurrency=(min,max), batch_size=B,
    num_cpus=1, batch_format="pyarrow")."""

    def __init__(self):
        # once-per-actor setup (the model-load analog): compile the rule
        # pack and build the entity gazetteer
        self.templates = [(p, re.compile(rx), sk, ok)
                          for p, rx, sk, ok in R.TEMPLATES]
        self.pronoun_templates = [(p, re.compile(rx), ok)
                                  for p, rx, ok in R.PRONOUN_TEMPLATES]
        self.gazetteer = frozenset(
            x.lower() for x in R.PERSONS + R.ORG_BASES + R.TOOLS + R.MODULES)
        self.n_batches = 0  # per-actor telemetry (Report analog)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_batches += 1
        # the per-batch kernel stays the vectorized one — actor state is
        # for the expensive-to-build parts, not a license to loop rows
        return X.extract_events(batch)


def extract_events_actor_pool(transcripts_ds: "ray.data.Dataset",
                              *, concurrency=(2, 8), batch_size: int = 4096
                              ) -> "ray.data.Dataset":
    return transcripts_ds.map_batches(
        TurnEventExtractor, concurrency=concurrency, batch_size=batch_size,
        num_cpus=1, batch_format="pyarrow")
