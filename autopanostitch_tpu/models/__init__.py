"""Pipeline stages mirroring the reference's main.m flow."""
