from .fields import Field, build_field
