"""Analysis transforms: infer codes from images given a dictionary.

Public API mirrors the reference library's analysis_transforms/ tree
(module-level ``run`` functions), re-implemented as jitted JAX programs.
All functions are pure: inputs are never mutated.
"""
