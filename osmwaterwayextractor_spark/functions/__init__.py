"""Pure NumPy kernels + Catalyst column builders.

Every numeric kernel here is shared verbatim between the Spark pandas-UDFs and
the single-process test oracle (``oracle.py``), so graph ids, lengths and tile
assignments are bit-identical on both paths by construction.
"""
