"""CLI entry points, mirroring the reference's module invocations
(reference README.MD:32-48: ``python -m src.generation`` ->
``src.preprocessing`` -> ``src.train_model`` -> ``src.matching``):

    python -m aml_entity_resolution_assignment_ray generate --out DIR --entities N
    python -m aml_entity_resolution_assignment_ray train --corpus DIR --model-out PATH
    python -m aml_entity_resolution_assignment_ray match --corpus DIR --checkpoints DIR
    python -m aml_entity_resolution_assignment_ray evaluate --corpus DIR --checkpoints DIR

The CLI owns the Ray session (guarded init); library code never calls
ray.init itself (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from .util import tune_context

    tune_context()


def cmd_generate(args):
    from .sources.synth import write_corpus

    meta = write_corpus(args.out, shards=args.shards,
                        n_entities=args.entities, seed=args.seed,
                        doppelganger_rate=args.doppelganger_rate)
    print(json.dumps({"out": args.out, **meta}))


def cmd_train(args):
    _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from .config import EngineConfig
    from .pipelines.train import train_model

    transcripts = rd.read_parquet(os.path.join(args.corpus, "transcripts"))
    truth = rd.read_parquet(os.path.join(args.corpus, "truth.parquet"))
    cfg = EngineConfig(model_path="")
    model, report = train_model(transcripts, truth, cfg,
                                save_path=args.model_out)
    print(json.dumps({"model": args.model_out, **report}))
    ray.shutdown()


def cmd_match(args):
    _init_ray(args.num_cpus)
    import ray

    from .config import EngineConfig
    from .pipelines.checkpointed import run_flagship_checkpointed

    cfg = EngineConfig(**({"model_path": args.model} if args.model else {}))
    res = run_flagship_checkpointed(
        os.path.join(args.corpus, "transcripts"), args.checkpoints, cfg)
    out = {
        "stages": res["manager"].events,
        "clusters": int(res["predictions"].count()),
    }
    if args.out:
        res["predictions"].write_parquet(args.out)
        out["out"] = args.out
    print(json.dumps(out))
    ray.shutdown()


def cmd_probe(args):
    """Single-record resolution against a checkpointed run — the CLI
    analogue of the reference's API /resolve (api.py:300-380)."""
    _init_ray(args.num_cpus)
    import ray

    from .config import EngineConfig
    from .pipelines.checkpointed import run_flagship_checkpointed
    from .pipelines.probe import resolve_record
    from .stages.block import emit_keys

    cfg = EngineConfig(**({"model_path": args.model} if args.model else {}))
    res = run_flagship_checkpointed(
        os.path.join(args.corpus, "transcripts"), args.checkpoints, cfg)
    profiles = res["profiles"]
    record = json.loads(args.record)
    matches = resolve_record(record, profiles, emit_keys(profiles, cfg),
                             cfg, limit=args.limit)
    print(matches.to_json(orient="records"))
    ray.shutdown()


def cmd_serve(args):
    """Serve POST /resolve + GET /health + GET /metrics over a
    checkpointed run — the reference's `uvicorn src.api:app`
    (README.MD:46-48), on stdlib http.server."""
    _init_ray(args.num_cpus)
    import ray

    from .config import EngineConfig
    from .pipelines.checkpointed import run_flagship_checkpointed
    from .serve import ResolveService, start_server
    from .stages.block import emit_keys

    cfg = EngineConfig(**({"model_path": args.model} if args.model else {}))
    res = run_flagship_checkpointed(
        os.path.join(args.corpus, "transcripts"), args.checkpoints, cfg)
    profiles = res["profiles"]
    svc = ResolveService(profiles, emit_keys(profiles, cfg), cfg,
                         limit=args.limit)
    server, thread = start_server(svc, host=args.host, port=args.port)
    print(json.dumps({"serving": list(server.server_address),
                      "endpoints": ["/resolve", "/health", "/metrics"]}),
          flush=True)
    try:
        thread.join()
    except KeyboardInterrupt:
        server.shutdown()
        ray.shutdown()


def cmd_prep(args):
    """Checkpointed LLM training-data prep: exact dedup -> quality +
    language gate -> benchmark decontamination -> token counts, each
    stage a resumable Parquet checkpoint with lineage + metrics."""
    _init_ray(args.num_cpus)
    import ray

    from .config import EngineConfig
    from .pipelines.corpus_prep import run_corpus_prep_checkpointed

    res = run_corpus_prep_checkpointed(
        args.docs, args.benchmark, args.checkpoints,
        quality_min=args.quality_min, lang=args.lang,
        contamination_n=args.ngram, cfg=EngineConfig())
    out = {
        "stages": res["manager"].events,
        "survivors": int(res["prepped"].count()),
    }
    if args.out:
        res["prepped"].write_parquet(args.out)
        out["out"] = args.out
    print(json.dumps(out))
    ray.shutdown()


def cmd_encode(args):
    """Checkpointed corpus encode: clean -> dedup -> tokenize to ids
    against a corpus-learned vocabulary -> pack into fixed-length
    sequences; each stage a resumable Parquet checkpoint."""
    _init_ray(args.num_cpus)
    import ray

    from .config import EngineConfig
    from .pipelines.encode import run_encode_checkpointed

    res = run_encode_checkpointed(
        args.docs, args.checkpoints, max_chars=args.max_chars,
        seq_len=args.seq_len, n_shards=args.shards, cfg=EngineConfig())
    out = {
        "stages": res["manager"].events,
        "n_docs_packed": int(res["packed"].count()),
        "n_tokens": int(res["encoded"].count()),
        "vocab_dir": res["vocab_dir"],
    }
    if args.out:
        res["packed"].write_parquet(args.out, partition_cols=["shard"])
        out["out"] = args.out
    print(json.dumps(out))
    ray.shutdown()


def cmd_evaluate(args):
    _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from .config import EngineConfig
    from .pipelines.checkpointed import run_flagship_checkpointed
    from .stages.evaluate import labeled_pair_eval, pairwise_eval

    cfg = EngineConfig(**({"model_path": args.model} if args.model else {}))
    res = run_flagship_checkpointed(
        os.path.join(args.corpus, "transcripts"), args.checkpoints, cfg)
    truth = rd.read_parquet(os.path.join(args.corpus, "truth.parquet"))
    print(json.dumps({
        "pair_eval": labeled_pair_eval(res["classified"], truth, cfg),
        "cluster_eval": pairwise_eval(res["predictions"], truth,
                                      res["classified"], cfg),
    }))
    ray.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="aml_entity_resolution_assignment_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a synthetic transcript corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--entities", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--shards", type=int, default=16)
    g.add_argument("--doppelganger-rate", type=float, default=0.05)
    g.set_defaults(fn=cmd_generate)

    t = sub.add_parser("train", help="train the match-probability model")
    t.add_argument("--corpus", required=True)
    t.add_argument("--model-out", required=True)
    t.set_defaults(fn=cmd_train)

    m = sub.add_parser("match", help="run the checkpointed ER pipeline")
    m.add_argument("--corpus", required=True)
    m.add_argument("--checkpoints", required=True)
    m.add_argument("--model", default=None)
    m.add_argument("--out", default=None,
                   help="also export predictions as partitioned parquet")

    pr = sub.add_parser("probe", help="resolve one record (JSON) against "
                                      "a checkpointed run")
    pr.add_argument("--corpus", required=True)
    pr.add_argument("--checkpoints", required=True)
    pr.add_argument("--record", required=True,
                    help='JSON, e.g. \'{"first_name": "Jan", ...}\'')
    pr.add_argument("--model", default=None)
    pr.add_argument("--limit", type=int, default=50)
    pr.set_defaults(fn=cmd_probe)
    m.set_defaults(fn=cmd_match)

    pp = sub.add_parser("prep", help="checkpointed training-data prep "
                                     "(dedup/quality/LID/decontaminate)")
    pp.add_argument("--docs", required=True,
                    help="documents parquet file or directory")
    pp.add_argument("--benchmark", required=True,
                    help="held-out benchmark parquet (decontamination set)")
    pp.add_argument("--checkpoints", required=True)
    pp.add_argument("--quality-min", type=float, default=0.35)
    pp.add_argument("--lang", default="en")
    pp.add_argument("--ngram", type=int, default=4)
    pp.add_argument("--out", default=None,
                    help="also export survivors as partitioned parquet")
    pp.set_defaults(fn=cmd_prep)

    en = sub.add_parser("encode", help="checkpointed corpus encode "
                                       "(clean/dedup/tokenize/pack)")
    en.add_argument("--docs", required=True,
                    help="documents parquet file or directory")
    en.add_argument("--checkpoints", required=True)
    en.add_argument("--max-chars", type=int, default=2000)
    en.add_argument("--seq-len", type=int, default=256)
    en.add_argument("--shards", type=int, default=8)
    en.add_argument("--out", default=None,
                    help="also export pack assignments as "
                         "shard-partitioned parquet")
    en.set_defaults(fn=cmd_encode)

    sv = sub.add_parser("serve", help="HTTP /resolve service over a "
                                      "checkpointed run")
    sv.add_argument("--corpus", required=True)
    sv.add_argument("--checkpoints", required=True)
    sv.add_argument("--model", default=None)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--limit", type=int, default=50)
    sv.set_defaults(fn=cmd_serve)

    e = sub.add_parser("evaluate", help="pipeline + pairwise F1 vs truth")
    e.add_argument("--corpus", required=True)
    e.add_argument("--checkpoints", required=True)
    e.add_argument("--model", default=None)
    e.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
