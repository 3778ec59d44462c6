"""datacapsule_ray — a from-scratch Ray-Data-native knowledge-graph
construction engine with the data-processing capabilities of
loukie7/Datacapsule (see SURVEY.md for the structural analysis).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture)."""

__version__ = "0.1.0"
