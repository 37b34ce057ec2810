"""USD schema layer (reference: newton/_src/usd — schema_resolver.py:46,
schemas.py). The resolvers and the text-USD parser live in utils; this
package mirrors the reference's ``newton.usd`` public module path."""

from ..utils.import_usd import (
    NewtonSchemaResolver,
    PhysxSchemaResolver,
    SchemaResolver,
    SchemaResolverManager,
    parse_usd,
)
from ..utils.usda_parser import UsdaPrim, parse_usda

__all__ = ["NewtonSchemaResolver", "PhysxSchemaResolver", "SchemaResolver",
           "SchemaResolverManager", "UsdaPrim", "parse_usd", "parse_usda"]
