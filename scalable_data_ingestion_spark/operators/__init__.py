"""Pipeline operators: cleaning, enrichment, standardization, dedup,
text analysis, similarity search — plus their oracle-checked query
registrations."""
