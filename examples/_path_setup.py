"""Make the repo root importable when running examples from a checkout
(no install needed).  Equivalent role to the reference's
examples/_set_the_path.py."""
import sys
from pathlib import Path

_root = str(Path(__file__).resolve().parent.parent)
if _root not in sys.path:
  sys.path.insert(0, _root)
