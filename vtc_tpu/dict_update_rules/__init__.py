"""Dictionary update rules.

Public API mirrors the reference library's dict_update_rules/ tree with one
deliberate change: the reference mutates the dictionary tensor in place;
here every ``run`` is a pure jitted function that RETURNS the new
dictionary (functional core -- required for jit/shard_map composition).
"""
