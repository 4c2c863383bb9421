from tpu_audio.parallel.mesh import make_mesh, shard_params, ShardingRules  # noqa: F401
