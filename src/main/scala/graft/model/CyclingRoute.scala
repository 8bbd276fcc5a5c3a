package graft.model

import java.sql.Timestamp

/** Typed route schema — mirrors the reference's CyclingRoute SQLAlchemy model
  * (src/utils/db_models.py:17-59): identification, source metadata,
  * administrative fields, calculated length, lineage and audit timestamp.
  * Geometry is carried as WKT (the relational sink in the reference stores
  * `SRID=4326;<wkt>` — db_helpers.py:185-190).
  *
  * Used as a Dataset[CyclingRoute] where type safety helps (sinks, streaming);
  * the dynamic-schema path stays DataFrame.
  */
final case class CyclingRoute(
    id: Long,
    route_id: String,
    street: String,
    locality: String,
    route_type: String,
    notes: Option[String],
    surface: String,
    ncn_route: Option[String],
    traffic: String,
    local_authority: String,
    la_s_code: String,
    sh_date_uploaded: String,
    sh_src: String,
    sh_src_id: Double,
    route_length_m: Double,
    source_file: String,
    created_at: Timestamp,
    geometry_wkt: String
)
