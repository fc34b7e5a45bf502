"""DataFrame operators: preprocess, coref, blocking, features, resolve,
clustering, dedup, similarity — each a pure DataFrame -> DataFrame function."""
