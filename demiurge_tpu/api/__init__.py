from .project import Layer, Project, ReversibleHistory, SnapshotHistory

__all__ = ["Layer", "Project", "ReversibleHistory", "SnapshotHistory"]
