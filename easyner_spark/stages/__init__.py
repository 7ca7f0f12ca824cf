"""KG pipeline stages: pages → documents → sentences → mentions →
linked → canonical → triples (+ frequency analysis)."""
