"""Pure, deterministic scalar/record functions (no Ray dependency).

These are the byte-identity surface of the engine: every normalization choice
is order-sensitive and separately unit-tested (SURVEY.md §7.5).
"""
