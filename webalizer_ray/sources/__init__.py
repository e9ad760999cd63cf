from webalizer_ray.sources.readers import (  # noqa: F401
    read_lookup_dicts,
    read_turns,
)
