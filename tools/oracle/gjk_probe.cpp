// gjk_probe: feed (box pose, triangle) pairs through Bullet's actual
// box-vs-triangle narrowphase (the same path Arena uses for car-vs-mesh:
// btConvexConcave -> btConvexTriangleCallback -> GJK + Minkowski pd solver)
// and print the resulting manifold points.  Used to calibrate the JAX
// box_tri contact generation against the reference's exact behavior.
//
// stdin (text): each line
//   cx cy cz  m00 m01 m02 m10 m11 m12 m20 m21 m22  hx hy hz  ax ay az bx by bz cx cy cz
// (box center, rotation rows, half extents incl margin, triangle verts —
//  all in BT units).  Output: one line per manifold point:
//   PT i n=(..) posB=(..) posA=(..) d=..
#include <cstdio>
#include <cstdlib>

#include "btBulletCollisionCommon.h"
#include "BulletCollision/CollisionShapes/btTriangleShape.h"
#include "BulletCollision/NarrowPhaseCollision/btGjkPairDetector.h"
#include "BulletCollision/NarrowPhaseCollision/btPointCollector.h"
#include "BulletCollision/NarrowPhaseCollision/btGjkEpaPenetrationDepthSolver.h"
#include "BulletCollision/NarrowPhaseCollision/btVoronoiSimplexSolver.h"

int main() {
    btDefaultCollisionConfiguration cfg;
    cfg.setup({});
    btCollisionDispatcher dispatcher;
    dispatcher.setup(&cfg);
    double v[24];
    int pairIdx = 0;
    while (true) {
        for (int i = 0; i < 24; i++)
            if (scanf("%lf", &v[i]) != 1) return 0;
        btVector3 center(v[0], v[1], v[2]);
        btMatrix3x3 rot(v[3], v[4], v[5], v[6], v[7], v[8], v[9], v[10],
                        v[11]);
        btBoxShape box(btVector3(v[12], v[13], v[14]));

        // the per-triangle shape exactly as btConvexTriangleCallback
        // builds it (btTriangleShape with the mesh's margin)
        btTriangleShape mesh(btVector3(v[15], v[16], v[17]),
                             btVector3(v[18], v[19], v[20]),
                             btVector3(v[21], v[22], v[23]));
        mesh.setMargin(0.0f);  // btConcaveShape default margin (real pipeline)

        btCollisionObject boxObj, meshObj;
        boxObj.setCollisionShape(&box);
        boxObj.setWorldTransform(btTransform(rot, center));
        meshObj.setCollisionShape(&mesh);
        meshObj.setWorldTransform(btTransform::getIdentity());

        // exactly what btConvexConvexAlgorithm::processCollision runs
        btVoronoiSimplexSolver simplex;
        btGjkEpaPenetrationDepthSolver pd;
        btGjkPairDetector gjk(&box, &mesh, &simplex, &pd);
        btGjkPairDetector::ClosestPointInput input;
        input.m_transformA = boxObj.getWorldTransform();
        input.m_transformB = meshObj.getWorldTransform();
        input.m_maximumDistanceSquared =
            box.getMargin() + mesh.getMargin() + 0.1f;
        input.m_maximumDistanceSquared *= input.m_maximumDistanceSquared;
        btPointCollector pc;
        gjk.getClosestPoints(input, pc, false);
        printf("PAIR %d hit=%d n=(%.6f,%.6f,%.6f) posB=(%.6f,%.6f,%.6f) "
               "d=%.6f\n", pairIdx++, pc.m_hasResult,
               pc.m_normalOnBInWorld.x(), pc.m_normalOnBInWorld.y(),
               pc.m_normalOnBInWorld.z(), pc.m_pointInWorld.x(),
               pc.m_pointInWorld.y(), pc.m_pointInWorld.z(),
               pc.m_distance);
        fflush(stdout);
    }
}
