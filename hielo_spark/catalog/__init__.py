"""Catalog layer: connection profiles (S1-S4, S9) and browse/search
operators (F2-F4, F9, O3) over catalog listings."""
