"""Repo tooling (bench diff, query checking, scaling probes, fixtures).

A package so tests can import the driver-mimic compare logic
(``tools.check_queries``) and the weird-corpus generator
(``tools.gen_weird_corpus``) instead of duplicating them.
"""
