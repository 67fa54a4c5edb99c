"""Ray Data pipeline stages.

Each stage is a function ``(ray.data.Dataset, EngineConfig) ->
ray.data.Dataset`` built from ``map_batches`` / ``sort`` / ``groupby`` /
``join`` primitives; stateful stages are callable classes run as actor
pools. Stages never call ``ray.init``.
"""
