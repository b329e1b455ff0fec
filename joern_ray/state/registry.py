"""Stage registry — the LayerCreator / overlay-extension surface.

Reference: overlays declare ``overlayName`` / ``description`` /
``dependsOn`` and are discovered + run by name from the console
(``semanticcpg/.../layers/LayerCreator.scala:1-80``, runner
``console/Run.scala:1-104``).  Here a Stage is a named Dataset→Dataset
function over a shared dict of named datasets; the registry toposorts by
``deps`` and executes, optionally checkpointing each stage through the
Manifest ledger (skip-completed + lineage, ``state/manifest.py``).

Users extend the engine by registering stages (decorator or object) — the
pip-installable rule-pack analog of the reference's PluginManager.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .manifest import Manifest


@dataclass
class Stage:
    name: str
    fn: Callable[[dict], "object"]      # datasets dict -> output Dataset
    deps: list[str] = field(default_factory=list)
    description: str = ""


class StageRegistry:
    def __init__(self):
        self._stages: dict[str, Stage] = {}

    def register(self, name: str, *, deps: list[str] | None = None,
                 description: str = ""):
        """Decorator: @registry.register("entities", deps=["triples"])."""
        def wrap(fn):
            self.add(Stage(name, fn, list(deps or []), description))
            return fn
        return wrap

    def add(self, stage: Stage) -> None:
        if stage.name in self._stages:
            raise ValueError(f"duplicate stage {stage.name!r}")
        self._stages[stage.name] = stage

    def names(self) -> list[str]:
        return sorted(self._stages)

    def toposort(self, targets: list[str] | None = None) -> list[Stage]:
        """Dependency order (deterministic: lexicographic tie-break);
        raises on unknown deps and cycles."""
        want = sorted(targets) if targets else self.names()
        order: list[Stage] = []
        state: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str, chain: tuple):
            if name in chain:
                raise ValueError(f"stage cycle: {' -> '.join(chain + (name,))}")
            if state.get(name) == 1:
                return
            st = self._stages.get(name)
            if st is None:
                raise ValueError(f"unknown stage {name!r} "
                                 f"(needed by {chain[-1] if chain else '?'})")
            for d in sorted(st.deps):
                if d != "input":
                    visit(d, chain + (name,))
            state[name] = 1
            order.append(st)

        for n in want:
            visit(n, ())
        return order

    def run(self, inputs: dict, *, targets: list[str] | None = None,
            out_dir: str | None = None) -> dict:
        """Execute stages in dependency order over a shared datasets dict.

        With out_dir, every stage checkpoints through the Manifest (write
        Parquet + lineage record; completed stages are skipped on re-run
        and re-read from their checkpoints)."""
        datasets = dict(inputs)
        man = Manifest(out_dir) if out_dir else None
        for st in self.toposort(targets):
            if man is not None:
                datasets[st.name] = man.run_stage(
                    st.name, lambda st=st: st.fn(datasets),
                    deps=st.deps, fingerprint=True)
            else:
                datasets[st.name] = st.fn(datasets)
        return datasets


def kg_registry() -> StageRegistry:
    """The flagship pipeline expressed as registered overlay stages."""
    from ..pipelines import kg
    from ..stages import extract as X
    from ..stages import link as L
    from ..stages import materialize as M

    reg = StageRegistry()

    reg.add(Stage(
        "triples_surface",
        lambda d: X.extract_triples(d["transcripts"]),
        ["input"], "per-turn triple extraction + pronoun resolution"))
    reg.add(Stage(
        "entities",
        lambda d: L.build_entities(L.vocab_from_mentions(
            d["triples_surface"].map_batches(
                L.mentions_from_triples, batch_format="pyarrow"))),
        ["triples_surface"], "mention vocabulary → canonical entities"))
    reg.add(Stage(
        "triples_canonical",
        lambda d: M.canonical_triples(
            d["triples_surface"], M.entity_lookup_ref(d["entities"])),
        ["triples_surface", "entities"], "directory join + stubs"))
    reg.add(Stage(
        "nodes",
        lambda d: (d["transcripts"]
                   .map_batches(M.turn_nodes, batch_format="pyarrow")
                   .union(kg.conversation_nodes(d["transcripts"]))
                   .union(M.entity_nodes(d["entities"]))),
        ["input", "entities"], "TURN/CONVERSATION/ENTITY node table"))
    reg.add(Stage(
        "edges",
        lambda d: (d["transcripts"]
                   .map_batches(M.next_turn_edges, batch_format="pyarrow")
                   .union(d["transcripts"].map_batches(
                       M.replies_to_edges, batch_format="pyarrow"))
                   .union(M.fact_and_mention_edges(d["triples_canonical"]))),
        ["input", "triples_canonical"],
        "NEXT_TURN/REPLIES_TO/FACT/MENTIONS/USES_TOOL edges"))
    return reg
