#!/usr/bin/env bash
# Smoke request (reference torchserve/recommend.sh).
curl -s -X POST "http://localhost:${2:-8080}/v1/models/lightgcn_recommender:predict" \
    -H 'Content-Type: application/json' -d "[${1:-1189793}]"
