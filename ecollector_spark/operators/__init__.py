"""Custom operators Spark lacks as built-ins, expressed as compositions
of DataFrame primitives (never pairwise/BNLJ): as-of join, interval
(range) join."""
