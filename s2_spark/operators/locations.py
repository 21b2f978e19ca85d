"""Locations API (A25): list / get-default / set-default.

Mirrors the reference's contract — ``LocationInfo {name, is_private}``
(api/src/v1/location.rs:1-24), name validation of 1..=64 ASCII
letters/digits/colons/hyphens/periods (common/src/location.rs:9-67,
common/src/caps.rs:3), and the three v1 endpoints
(lite/src/handlers/v1/locations.rs). The lite backend stubs all three
as NotImplemented; here they are a constant driver-side table with a
settable default — placement is a deployment constant, not data-plane
state, so no distributed machinery is warranted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from s2_spark.model import S2Error

MAX_LOCATION_NAME_LEN = 64  # common/src/caps.rs:3

_ALLOWED_EXTRA = {":", "-", "."}


def validate_location_name(name: str) -> None:
    """common/src/location.rs:9-35,58-67: 1..=64 chars of ASCII
    letters, numbers, colons, hyphens, and periods."""
    if len(name) < 1:
        raise S2Error("location name must be at least 1 character in length")
    if len(name) > MAX_LOCATION_NAME_LEN:
        raise S2Error(
            f"location name must be at most {MAX_LOCATION_NAME_LEN} "
            "characters in length"
        )
    for c in name:
        if not (c.isascii() and c.isalnum()) and c not in _ALLOWED_EXTRA:
            raise S2Error(
                "location name must comprise ASCII letters, numbers, "
                "colons, hyphens, and periods"
            )


@dataclass(frozen=True)
class LocationInfo:
    """api/src/v1/location.rs:7-13."""

    name: str
    is_private: bool = False


# the public placement set — cloud:region names in the reference's
# format (deployment constants)
DEFAULT_LOCATIONS = (
    LocationInfo("aws:us-east-1", False),
    LocationInfo("aws:us-west-2", False),
    LocationInfo("aws:eu-central-1", False),
    LocationInfo("local", False),
)


class LocationRegistry:
    """The three location endpoints over a constant table."""

    def __init__(
        self,
        spark: SparkSession,
        locations: tuple[LocationInfo, ...] = DEFAULT_LOCATIONS,
        default: str = "local",
    ):
        for loc in locations:
            validate_location_name(loc.name)
        self.spark = spark
        self._locations = {loc.name: loc for loc in locations}
        self._default = default
        if default not in self._locations:
            raise S2Error(f"unknown location {default!r}")

    def list_locations(self) -> list[LocationInfo]:
        """GET /locations (locations.rs:26-30)."""
        return sorted(self._locations.values(), key=lambda loc: loc.name)

    def locations_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(loc.name, loc.is_private) for loc in self.list_locations()],
            "name string, is_private boolean",
        )

    def get_default(self) -> LocationInfo:
        """GET /locations/default (locations.rs:44-48)."""
        return self._locations[self._default]

    def set_default(self, name: str) -> LocationInfo:
        """PUT /locations/default (locations.rs:70-75): validates the
        name and requires it to be a known location."""
        validate_location_name(name)
        if name not in self._locations:
            raise S2Error(f"unknown location {name!r}")
        self._default = name
        return self._locations[name]
