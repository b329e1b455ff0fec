"""Actor-pool extraction must equal the stateless task-pool stage."""

import pyarrow as pa

import ray.data

from joern_ray import synth
from joern_ray.pipelines import kg
from joern_ray.stages import extract as X
from joern_ray.stages.actor_extract import extract_events_actor_pool


def _rows(ds):
    t = pa.concat_tables([b for b in ds.iter_batches(batch_format="pyarrow")
                          if b.num_columns])
    rows = map(tuple, zip(*[c.to_pylist() for c in t.columns]))
    # None-safe sort key (pronoun events carry a NULL subj)
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def test_actor_pool_equals_stateless(ray_session, sf_small):
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    stateless = ds.map_batches(X.extract_events, batch_format="pyarrow")
    actors = extract_events_actor_pool(ds, concurrency=2, batch_size=512)
    assert _rows(stateless) == _rows(actors)
