from .sharding import make_mesh, sharded_extract_count_step
