"""Pure, deterministic scalar/vector functions shared by all stages.

Everything in this package is Ray-free and side-effect-free so it can be
unit-tested directly and reused inside ``map_batches`` UDFs and the
golden-fixture oracle.
"""
