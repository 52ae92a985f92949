from . import io

__all__ = ["io", "jira"]
