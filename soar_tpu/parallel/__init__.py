from .views import VIEW_AXIS, make_view_mesh, replicate, view_sharder  # noqa: F401
