"""Large-scale data-pipeline operators (the north-star extensions).

Everything here is built from JVM-side DataFrame primitives — explode /
groupBy / join / window over deterministic hash functions — so plans stay
inside whole-stage codegen and scale by shuffle, never by driver loops.
Python (pandas UDF) appears only where Spark genuinely lacks the
primitive (multimodal decode)."""
