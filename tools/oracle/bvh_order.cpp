// bvh_order: load a .cmf exactly like the reference (raw coords, no unit
// conversion), build the btBvhTriangleMeshShape, and print the triangle
// indices in BVH traversal order for a whole-arena AABB query.  Used to
// validate the numpy replica of the quantized-BVH build (mesh.py
// bvh_leaf_order) that determines manifold insertion order.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "btBulletCollisionCommon.h"

struct OrderCallback : public btTriangleCallback {
    std::vector<int> order;
    void processTriangle(btVector3*, int, int triangleIndex) override {
        order.push_back(triangleIndex);
    }
};

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: bvh_order mesh.cmf\n"); return 1; }
    FILE* f = std::fopen(argv[1], "rb");
    if (!f) { std::perror("open"); return 1; }
    int32_t numTris, numVerts;
    if (std::fread(&numTris, 4, 1, f) != 1) return 2;
    if (std::fread(&numVerts, 4, 1, f) != 1) return 2;
    std::vector<int32_t> tris(numTris * 3);
    std::vector<float> verts(numVerts * 3);
    if ((int)std::fread(tris.data(), 12, numTris, f) != numTris) return 2;
    if ((int)std::fread(verts.data(), 12, numVerts, f) != numVerts) return 2;
    std::fclose(f);

    // CollisionMeshFile::MakeBulletMesh: findOrAddVertex(v, false)
    btTriangleMesh tm;
    for (int i = 0; i < numVerts; i++)
        tm.findOrAddVertex(
            btVector3(verts[i * 3], verts[i * 3 + 1], verts[i * 3 + 2]),
            false);
    for (int i = 0; i < numTris; i++)
        tm.addTriangleIndices(tris[i * 3], tris[i * 3 + 1], tris[i * 3 + 2]);

    btBvhTriangleMeshShape shape(&tm, true);
    OrderCallback cb;
    shape.processAllTriangles(&cb, btVector3(-1e6, -1e6, -1e6),
                              btVector3(1e6, 1e6, 1e6));
    for (int i : cb.order) std::printf("%d\n", i);
    return 0;
}
