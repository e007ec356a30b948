"""Per-operator-module DQ registrations; dq.py aggregates."""

from __future__ import annotations

from multi_model_vectorsearch_spark.operators.registrations import ann
from multi_model_vectorsearch_spark.operators.registrations import curation
from multi_model_vectorsearch_spark.operators.registrations import embed
from multi_model_vectorsearch_spark.operators.registrations import graph
from multi_model_vectorsearch_spark.operators.registrations import relational
from multi_model_vectorsearch_spark.operators.registrations import retrieval
from multi_model_vectorsearch_spark.operators.registrations import scale
from multi_model_vectorsearch_spark.operators.registrations import textpipe
from multi_model_vectorsearch_spark.operators.registrations import timeseries
from multi_model_vectorsearch_spark.operators.registrations import tpch
from multi_model_vectorsearch_spark.operators.registrations import vector_ops
from multi_model_vectorsearch_spark.operators.registrations import windows_batch

MODULES = [ann, curation, embed, graph, relational, retrieval, scale, textpipe, timeseries, tpch, vector_ops, windows_batch]
