package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** JVM twin of [[Osgb.reprojectSql]]'s shared-SQL chain: the identical
  * double-precision operations in the identical order, so the native
  * expression path (plans/OsgbToWgs84) produces bit-for-bit what Catalyst's
  * codegen produces for the SQL text (both compile to the same java.lang.Math
  * calls). The oracle keeps running the SQL twin in DuckDB; agreement at the
  * rounded output (5 decimals ≈ 1 m) is unchanged.
  *
  * Kept as a top-level object so the scalac static forwarder makes
  * `graft.functions.OsgbMath.latlon(e, n)` callable from generated Java.
  */
object OsgbMath {

  private val Pi = java.lang.Math.PI
  private val Lat0 = 49 * Pi / 180
  private val Lon0 = -2 * Pi / 180
  private val Af0 = 6377563.396 * 0.9996012717
  private val Bf0 = 6356256.909 * 0.9996012717
  private val E2 = 1 - (6356256.909 * 6356256.909) / (6377563.396 * 6377563.396)
  private val Nsm = (6377563.396 - 6356256.909) / (6377563.396 + 6356256.909)
  private val E2w = 1 - (6356752.3142 * 6356752.3142) / (6378137.0 * 6378137.0)
  private val Rx = (0.1502 / 3600) * Pi / 180
  private val Ry = (0.2470 / 3600) * Pi / 180
  private val Rz = (0.8421 / 3600) * Pi / 180
  private val Sc = 1 + (-20.4894 / 1000000)

  /** Meridional arc M(phi) on Airy×F0 — OS series form (mirrors `marc`). */
  private def marc(phi: Double): Double = {
    import java.lang.Math.{cos, sin}
    Bf0 * ((1 + Nsm + 1.25 * Nsm * Nsm + 1.25 * Nsm * Nsm * Nsm) * (phi - Lat0)
      - (3 * Nsm + 3 * Nsm * Nsm + 2.625 * Nsm * Nsm * Nsm) * sin(phi - Lat0) * cos(phi + Lat0)
      + (1.875 * Nsm * Nsm + 1.875 * Nsm * Nsm * Nsm) * sin(2 * (phi - Lat0)) * cos(2 * (phi + Lat0))
      - (35.0 / 24.0) * Nsm * Nsm * Nsm * sin(3 * (phi - Lat0)) * cos(3 * (phi + Lat0)))
  }

  /** (lat, lon) degrees for a BNG easting/northing, h = 0. */
  def latlon(easting: Double, northing: Double): ArrayData = {
    import java.lang.Math._
    val dn = northing + 100000
    var phi = dn / Af0 + Lat0
    var i = 0
    while (i < 6) { phi = (dn - marc(phi)) / Af0 + phi; i += 1 }
    val sp = sin(phi); val cp = cos(phi); val tp = tan(phi)
    val vv = 1 - E2 * sp * sp
    val nu = Af0 / sqrt(vv)
    val rho = Af0 * (1 - E2) / (vv * sqrt(vv))
    val eta2 = nu / rho - 1
    val t2 = tp * tp; val t4 = t2 * t2; val t6 = t4 * t2
    val secp = 1 / cp
    val nu3 = nu * nu * nu; val nu5 = nu3 * nu * nu; val nu7 = nu5 * nu * nu
    val vii = tp / (2 * rho * nu)
    val viii = tp / (24 * rho * nu3) * (5 + 3 * t2 + eta2 - 9 * t2 * eta2)
    val ix = tp / (720 * rho * nu5) * (61 + 90 * t2 + 45 * t4)
    val xf = secp / nu
    val xi = secp / (6 * nu3) * (nu / rho + 2 * t2)
    val xii = secp / (120 * nu5) * (5 + 28 * t2 + 24 * t4)
    val xiia = secp / (5040 * nu7) * (61 + 662 * t2 + 1320 * t4 + 720 * t6)
    val de = easting - 400000
    val de2 = de * de; val de3 = de2 * de; val de4 = de3 * de
    val de5 = de4 * de; val de6 = de5 * de; val de7 = de6 * de
    val latos = phi - vii * de2 + viii * de4 - ix * de6
    val lonos = Lon0 + xf * de - xi * de3 + xii * de5 - xiia * de7
    val sphi = sin(latos); val cphi = cos(latos)
    val slam = sin(lonos); val clam = cos(lonos)
    val nua = 6377563.396 / sqrt(1 - E2 * sphi * sphi)
    val x1 = nua * cphi * clam; val y1 = nua * cphi * slam; val z1 = nua * (1 - E2) * sphi
    val x2 = 446.448 + Sc * x1 - Rz * y1 + Ry * z1
    val y2 = -125.157 + Rz * x1 + Sc * y1 - Rx * z1
    val z2 = 542.060 - Ry * x1 + Rx * y1 + Sc * z1
    val pr = sqrt(x2 * x2 + y2 * y2)
    var pw = atan2(z2, pr * (1 - E2w))
    var j = 0
    while (j < 4) {
      pw = atan2(z2 + E2w * (6378137.0 / sqrt(1 - E2w * sin(pw) * sin(pw))) * sin(pw), pr)
      j += 1
    }
    new GenericArrayData(Array(pw * 180 / Pi, atan2(y2, x2) * 180 / Pi))
  }
}
