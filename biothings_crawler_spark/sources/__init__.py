"""Seed-expansion sources (SURVEY.md §2.1): sitemap recursion, ID-range
generation, paginated-API expansion, incremental cursor scans."""
