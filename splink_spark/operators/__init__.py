"""Pipeline operators (SURVEY.md §2.1 O1–O22), each table-in → table-out."""
