"""Populated in later milestones."""
