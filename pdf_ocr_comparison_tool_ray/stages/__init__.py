"""Ray Data stages: map_batches bodies, actor-pool classes, shuffles."""
