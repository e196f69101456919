"""Pipeline: the 8 stage runners + CLI (the reference's integration/*.py
scripts, rebuilt over the artifact store + device ops)."""
