"""Relational post-processing: Infiscript filter DSL -> Spark SQL,
boosts, sorts, facets, pagination."""
